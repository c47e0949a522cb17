"""Zero-row robustness: every queries() operator must either return its
SQL-empty result shape (typed frame, zero or NULL-aggregate rows) or
raise a DOCUMENTED loud error — never a column-less-frame KeyError, a
numpy reduction crash, or a silent wrong answer. A validation engine
meets empty partitions constantly (fresh tables, over-filtered reads);
this is the invariant the central empty paths in shuffle.map_partials /
dedup._fused_grouped_frames maintain."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# ops whose semantics REQUIRE specific rows (a query / seed vector):
# they raise a clear, targeted error instead of returning a result
LOUD = {
    "ann_topk_embeddings": KeyError,
    "ann_lsh_embeddings": KeyError,
    "ann_ivf_embeddings": ValueError,
    "ann_range_embeddings": KeyError,
    "rrf_hybrid_topk_documents": KeyError,  # needs the vec_id=0 query
    "tf_cosine_topk_documents": KeyError,  # needs the doc_id=0 pivot
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    src = "/root/testdata/sf0.001"
    for t in TABLES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{d}/{t}.parquet")
    return str(d)


def test_every_query_handles_empty_input(empty_dir):
    import __ray_entry__ as m

    failures = []
    for name, fn in m.queries().items():
        if name in LOUD:
            with pytest.raises(LOUD[name]):
                fn(empty_dir)
            continue
        try:
            out = fn(empty_dir)
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {e}")
            continue
        assert isinstance(out, pd.DataFrame), name
        assert len(out.columns) > 0, f"{name}: column-less frame"
    assert not failures, "\n".join(failures)
