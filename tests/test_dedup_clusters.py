"""Duplicate-cluster labeling: the distributed hash-to-min label
propagation must produce the identical component structure as the
driver-side union-find on arbitrary edge lists, and the full pipeline
must match the DuckDB recursive-CTE oracle (covered again at the
conformance layer via queries()/oracle_sql())."""

import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.dedup import _cc_hash_to_min, _cc_union_find


def _component_sizes(labels: dict[int, int]) -> list[int]:
    lab = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
    return sorted(np.unique(lab, return_counts=True)[1].tolist())


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 50, 40), (1, 200, 150), (2, 500, 700)])
def test_hash_to_min_equals_union_find(seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    uf = _cc_union_find(a, b)
    h2m = _cc_hash_to_min(a, b, num_buckets=8)
    assert set(uf) == set(h2m)  # same node universe
    assert uf == h2m  # identical min-labels per node
    assert _component_sizes(uf) == _component_sizes(h2m)


def test_chain_converges_to_one_component():
    # a long path graph is the worst case for label propagation depth
    n = 64
    a = np.arange(n - 1, dtype=np.int64)
    b = np.arange(1, n, dtype=np.int64)
    h2m = _cc_hash_to_min(a, b, num_buckets=4)
    assert _component_sizes(h2m) == [n]
    assert all(v == 0 for v in h2m.values())


def test_pair_order_invariance():
    edges = [(5, 1), (2, 9), (9, 5)]
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    fwd = _cc_union_find(a, b)
    rev = _cc_union_find(b[::-1].copy(), a[::-1].copy())
    assert fwd == rev == {1: 1, 2: 1, 5: 1, 9: 1}


def _write_dup_corpus(tmpdir, n_groups=120, group_size=8):
    """Adversarially duplicated corpus: n_groups clusters of identical
    docs — pair count is quadratic in group_size (n_groups * C(gs,2))."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts, ids = [], []
    for g in range(n_groups):
        body = " ".join(f"tok{g}w{i} common{i % 3}" for i in range(12))
        for m in range(group_size):
            ids.append(g * 1000 + m)
            texts.append(body)
    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        f"{tmpdir}/documents.parquet",
    )


def test_distributed_clusters_match_driver_on_duplicated_corpus(tmp_path):
    """The object-store CC path (pairs, round state and labels never on
    the driver) must match driver union-find on a corpus whose pair list
    is quadratic-in-group-size, and the closed form: 120 clusters of 8."""
    from datapact_ray.pipelines.dedup import dedup_clusters_documents

    _write_dup_corpus(str(tmp_path))
    drv = dedup_clusters_documents(str(tmp_path), distributed=False)
    dist = dedup_clusters_documents(
        str(tmp_path), distributed=True,
        pairs_out_dir=str(tmp_path / "pairs"),
    )
    pd.testing.assert_frame_equal(drv, dist)
    assert dist["n_clusters"].iloc[0] == 120
    assert dist["docs_in_clusters"].iloc[0] == 960
    assert dist["largest_cluster"].iloc[0] == 8
    assert dist["docs_removable"].iloc[0] == 840
    # the parquet tap carries every verified edge: 120 * C(8,2)
    import glob

    edges = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(str(tmp_path / "pairs/*.parquet"))],
        ignore_index=True,
    )
    assert len(edges) == 120 * 28
    assert (edges["jaccard"] >= 0.3).all()
    # resumable tap: markers exist; a re-run skips rewriting (mtimes equal)
    import os

    files = sorted(glob.glob(str(tmp_path / "pairs/*.parquet")))
    mtimes = [os.path.getmtime(f) for f in files]
    dedup_clusters_documents(
        str(tmp_path), distributed=True, pairs_out_dir=str(tmp_path / "pairs")
    )
    assert [os.path.getmtime(f) for f in sorted(glob.glob(str(tmp_path / "pairs/*.parquet")))] == mtimes


def test_dup_span_census_unicode_and_boundaries(tmp_path):
    """Window semantics must equal SQL substr (codepoints, never split
    a multi-byte char; windows never cross documents; stride anchors
    per document); verified against DuckDB on a mixed-script fixture
    with deliberate shared spans."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapact_ray.pipelines.dedup import (
        _DUP_SPAN_SQL,
        dup_span_census_documents,
    )

    shared = "это общий абзац — shared span with ünïcode characters!!"
    docs = []
    for i in range(40):
        body = f"doc {i:03d} unique text " + "x" * (i % 7)
        if i % 3 == 0:
            body += shared  # cross-doc duplicated span
        if i % 11 == 0:
            body = shared + body  # duplicated at position 0 too
        docs.append((i, body, f"s{i % 4}"))
    docs.append((100, "short", "s0"))  # < window size: zero windows
    docs.append((101, None, "s1"))  # NULL text
    df = pd.DataFrame(docs, columns=["doc_id", "text", "source"])
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(d / "documents.parquet"),
    )
    got = dup_span_census_documents(str(d), num_buckets=5)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(_DUP_SPAN_SQL).fetchdf()
    finally:
        con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert got["dup_windows"].sum() > 0  # the shared spans were found
    # bucket-count invariance (global dup decision is partition-safe)
    alt = dup_span_census_documents(str(d), num_buckets=17)
    pd.testing.assert_frame_equal(got, alt)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.text(
                alphabet="abакц日🙂 x", min_size=0, max_size=90
            ),  # ascii + cyrillic + CJK + astral emoji + spaces
            st.integers(0, 2),  # source bucket
            st.integers(0, 3),  # duplication factor of a shared tail
        ),
        min_size=1,
        max_size=25,
    )
)
def test_dup_span_census_fuzz_matches_duckdb(tmp_path_factory, data):
    """Random unicode corpora (with injected shared spans) must match
    the DuckDB oracle exactly — positions, boundaries, scripts."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapact_ray.pipelines.dedup import (
        _dup_span_sql,
        dup_span_census_documents,
    )

    shared = "общий shared 日本語 span — long enough to cover windows!"
    rows = []
    for i, (txt, sb, dup) in enumerate(data):
        body = txt + (shared * dup)
        rows.append((i, body if body else None, f"s{sb}"))
    d = tmp_path_factory.mktemp("spanfuzz")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
                "source": pa.array([r[2] for r in rows], type=pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = dup_span_census_documents(str(d), num_buckets=3)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = con.execute(_dup_span_sql()).fetchdf()
    finally:
        con.close()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
