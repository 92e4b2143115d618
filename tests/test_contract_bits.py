"""The local contract gate must be bit-exact like the driver's hash.

Round 3 shipped a `change_rates` oracle emitting IEEE `-0.0` where the
engine emits `+0.0`; values compare equal under pandas' numeric `==`
(and under any round-to-k tolerance) so scripts/check_contract.py
certified it, but the driver's bitwise value-hash rejected it
(CORRECTNESS_r03). These tests pin the stricter semantics so the local
gate can never drift back to the weaker representation class.
"""

import numpy as np
import pandas as pd

from scripts.check_contract import _CANON_NAN, _float_bits, normalize


def test_negative_zero_bits_differ():
    a = _float_bits(pd.Series([-0.0]))
    b = _float_bits(pd.Series([0.0]))
    assert a.iloc[0] != b.iloc[0]
    assert a.iloc[0] == np.uint64(0x8000000000000000)
    assert b.iloc[0] == np.uint64(0)


def test_nan_payloads_canonicalized():
    # Two distinct NaN payloads must map to the single canonical one.
    weird = np.array([0x7FF8000000000001], dtype=np.uint64).view(np.float64)[0]
    a = _float_bits(pd.Series([np.nan, weird, None], dtype="float64"))
    assert (a == _CANON_NAN).all()


def test_ordinary_values_roundtrip_exactly():
    vals = [1.5, -2.25, 0.1, 3.141592653589793, -1e300, 5e-324]
    bits = _float_bits(pd.Series(vals))
    back = bits.to_numpy().view(np.float64)
    assert list(back) == vals


def test_normalize_flags_minus_zero_mismatch():
    eng = pd.DataFrame({"url": ["u1"], "change_rate": [0.0]})
    ora = pd.DataFrame({"url": ["u1"], "change_rate": [-0.0]})
    a, b = normalize(eng), normalize(ora)
    assert list(a.columns) == list(b.columns)
    assert not a.equals(b)  # the r03 driver red row, now red locally too


def test_normalize_still_passes_identical_frames():
    eng = pd.DataFrame({"id": [2, 1], "score": [0.5, np.nan]})
    ora = pd.DataFrame({"id": [1, 2], "score": [np.nan, 0.5]})
    assert normalize(eng).equals(normalize(ora))
