#!/usr/bin/env python3
"""Gate for check.py's comparator semantics (run: pytest scripts/ or
python3 scripts/test_check.py). The r13 advice asked for the
promotion-safe behavior to be TESTED, not just written: the vectorized
pass must compare values under numpy's own promotion to the common
wider type (never a one-sided astype, which wraps on narrowing or
signed/unsigned casts), apply the 1e-12 near-miss tolerance ONLY when
both sides are floats, and survive array-valued cells. Builder-side
tooling gate only — the engine itself is Scala/Spark."""
import sys
import os

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import cells_eq, compare_frames  # noqa: E402


def frame(col, vals, dtype=None):
    return pd.DataFrame({col: pd.Series(vals, dtype=dtype)})


def test_dtype_promotion_equal_values_pass():
    got = frame("a", [1, 2, 3], "int32")
    exp = frame("a", [1, 2, 3], "int64")
    failed, _ = compare_frames("t", got, exp)
    assert not failed


def test_wraparound_2_pow_32_fails():
    # a one-sided astype(int32) would wrap 2**32 to 0 and false-pass
    got = frame("a", [0], "int64")
    exp = frame("a", [2 ** 32], "int64")
    failed, _ = compare_frames("t", got, exp)
    assert failed


def test_signed_unsigned_sign_flip_fails():
    got = frame("a", np.array([np.iinfo(np.int64).min], dtype=np.int64))
    exp = frame("a", np.array([2 ** 63], dtype=np.uint64))
    failed, _ = compare_frames("t", got, exp)
    assert failed


def test_float_near_miss_passes_with_note():
    got = frame("a", [1.0, 2.0])
    exp = frame("a", [1.0, 2.0 * (1 + 1e-15)])
    failed, note = compare_frames("t", got, exp)
    assert not failed and note and "near-miss" in note


def test_float_vs_int_must_be_exact():
    # the both-floats-only tolerance branch: int-vs-float compares by
    # value with no epsilon
    failed, _ = compare_frames("t", frame("a", [1], "int64"),
                               frame("a", [1.0 + 1e-13], "float64"))
    assert failed
    failed, _ = compare_frames("t", frame("a", [1], "int64"),
                               frame("a", [1.0], "float64"))
    assert not failed


def test_nan_equals_nan_both_sides():
    failed, _ = compare_frames("t", frame("a", [float("nan"), 1.0]),
                               frame("a", [float("nan"), 1.0]))
    assert not failed


def test_array_cells_do_not_crash_and_compare():
    eq, _ = cells_eq(np.array([1, 2]), np.array([1, 2]))
    assert eq
    eq, _ = cells_eq(np.array([1, 2]), np.array([1, 3]))
    assert not eq
    got = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])]})
    exp = pd.DataFrame({"a": [np.array([1, 2]), np.array([3])]})
    failed, _ = compare_frames("t", got, exp)
    assert not failed


def test_value_mismatch_fails():
    failed, _ = compare_frames("t", frame("a", ["x", "y"]),
                               frame("a", ["x", "z"]))
    assert failed


if __name__ == "__main__":
    fns = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for fn in fns:
        fn()
        print(f"ok {fn.__name__}")
    print(f"ALL GREEN ({len(fns)} comparator tests)")
