"""Shared helpers for the oracle-checked query pipelines."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def round_duck(x, d: int):
    """Round like DuckDB's ``ROUND(DOUBLE, d)``: half away from zero via
    ``std::round(x * 10^d) / 10^d``. numpy/pandas round half-to-even, so
    values landing exactly on a half boundary (e.g. AVG = 25.40225 with a
    denominator dividing 10^4) hash-mismatch the oracle without this.

    The half-away decision compares the EXACT fraction (``a - floor(a)``
    is exact in IEEE754 for a ≥ 0) instead of the classic
    ``floor(a + 0.5)``: once ``|x|·10^d ≥ 2^52`` the added 0.5 is
    absorbed by round-to-nearest-even and the classic form misrounds
    exact integers up by one ulp — found by the hypothesis fuzz
    (``tests/test_round_duck_fuzz.py``), e.g. 450359962737.3125 at d=4,
    where ``std::round`` returns the value unchanged.

    Accepts scalars (None/NaN preserved), numpy arrays and pandas Series.
    """
    p = 10.0 ** d
    if isinstance(x, (pd.Series, np.ndarray)):
        v = np.asarray(x, dtype=np.float64)
        a = np.abs(v) * p
        f = np.floor(a)
        r = f + (a - f >= 0.5)
        out = np.where(np.isnan(v), v, np.copysign(r, v) / p)
        if isinstance(x, pd.Series):
            return pd.Series(out, index=x.index, name=x.name)
        return out
    if x is None:
        return None
    xf = float(x)
    if math.isnan(xf):
        return xf
    a = abs(xf) * p
    f = math.floor(a)
    r = f + (1 if a - f >= 0.5 else 0)
    return math.copysign(r, xf) / p
