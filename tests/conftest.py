import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dxa_pagerank_spark.session import get_spark  # noqa: E402


TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def testdata_path(rel: str) -> str:
    """Resolve a driver-testdata file (e.g. 'sf0.001/documents.parquet')
    and pytest.skip when the layout is absent, so the suite degrades to
    a skip instead of an error on machines without /root/testdata."""
    p = os.path.join(TESTDATA_ROOT, rel)
    if not os.path.exists(p):
        pytest.skip(f"driver testdata not found: {p}")
    return p


@pytest.fixture()
def sf0001_documents() -> str:
    return testdata_path("sf0.001/documents.parquet")


@pytest.fixture(scope="session")
def spark():
    # Small core/partition counts: unit graphs are tiny and the iterative
    # loops pay per-task scheduler overhead per superstep.
    s = get_spark(
        app_name="dxa_pagerank_spark_tests",
        cores=8,
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s
