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

    Accepts scalars (None/NaN preserved), numpy arrays and pandas Series.
    """
    p = 10.0 ** d
    if isinstance(x, (pd.Series, np.ndarray)):
        v = np.asarray(x, dtype=np.float64)
        out = np.where(
            np.isnan(v), v, np.copysign(np.floor(np.abs(v) * p + 0.5), v) / p
        )
        if isinstance(x, pd.Series):
            return pd.Series(out, index=x.index, name=x.name)
        return out
    if x is None:
        return None
    xf = float(x)
    if math.isnan(xf):
        return xf
    return math.copysign(math.floor(abs(xf) * p + 0.5), xf) / p
