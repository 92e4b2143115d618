"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 and compare against
oracle_sql() via DuckDB — row count, column names, and exact
order-insensitive values (mirrors the driver's value-hash).

Float columns are compared by their raw IEEE-754 bit patterns (NaN
canonicalized to the single quiet payload 0x7ff8...), matching the
driver's bitwise value-hash: `-0.0` vs `+0.0` is a FAIL here, exactly
as it is at the driver — pandas' numeric `==` (where -0.0 == 0.0) and
any round-to-k-decimals tolerance are one representation class weaker
and certified a query (change_rates, r03) the driver rejected.

Usage: python scripts/check_contract.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dxa_pagerank_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

_CANON_NAN = np.uint64(0x7FF8000000000000)


def _float_bits(series: pd.Series) -> pd.Series:
    """float64 -> exact IEEE-754 bit pattern, one canonical NaN payload.

    Preserves the -0.0 / +0.0 distinction on purpose: the driver's
    value-hash is bitwise, so the local gate must be too.
    """
    v = series.astype("float64").to_numpy(dtype="float64", na_value=np.nan)
    bits = v.view(np.uint64).copy()
    bits[np.isnan(v)] = _CANON_NAN
    return pd.Series(bits, index=series.index)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = _float_bits(df[c])
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ")
            print(pd.concat([a[neq].head(3), b[neq].head(3)]))
            continue
        print(f"OK    {name}: {len(a)} rows match [{dt:.1f}s]")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
