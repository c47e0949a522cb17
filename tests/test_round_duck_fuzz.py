"""Property-based parity fuzz: ``round_duck`` must equal DuckDB's
``ROUND(DOUBLE, d)`` bit-for-bit across the value/precision space the
oracles use (d ∈ 0..6). Dozens of oracle-exact operators round through
this one function, so a single boundary disagreement is a fleet-wide
hash mismatch — this pins the contract beyond the handful of
hand-picked half-boundary fixtures elsewhere."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datapact_ray.pipelines._util import round_duck

_CON = duckdb.connect()


def _duck_round(values: list[float], d: int) -> list[float]:
    # one vectorized query per case: UNNEST keeps ordering with ORDINALITY
    rel = _CON.execute(
        "SELECT ROUND(v, ?) FROM (SELECT UNNEST(?) AS v)", [d, values]
    ).fetchall()
    return [r[0] for r in rel]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e12,
            max_value=1e12,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_duck_matches_duckdb(values, d):
    got = [round_duck(v, d) for v in values]
    want = _duck_round(values, d)
    assert got == want, (values, d, got, want)
    # the vectorized path must agree with the scalar path exactly
    vec = round_duck(np.asarray(values, dtype=np.float64), d)
    assert vec.tolist() == got


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=-10**9, max_value=10**9),
    st.integers(min_value=1, max_value=128),
    st.integers(min_value=0, max_value=6),
)
def test_round_duck_exact_half_boundaries(num, den, d):
    """Dyadic rationals (num / 2^k-style denominators) land EXACTLY on
    representable half boundaries — the case numpy's half-to-even
    diverges on. Build the value as a float division so both engines see
    the identical double."""
    v = num / den
    assert round_duck(v, d) == _duck_round([v], d)[0]
