"""Non-parquet fallback paths of the fused scan helpers: the same
operator over CSV inputs must stream through the Dataset path and
produce the identical result the parquet fast path produces."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dual_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dual")
    rng = np.random.default_rng(7)
    n = 3000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 200, n).astype("int64"),
            "event_type": np.array(["view", "click", "purchase"])[
                rng.integers(0, 3, n)
            ],
            "value": np.round(rng.uniform(0.01, 100, n), 2),
        }
    )
    pq_dir = d / "pq"
    csv_dir = d / "csv"
    pq_dir.mkdir()
    csv_dir.mkdir()
    ev.to_parquet(pq_dir / "events.parquet", row_group_size=512)
    ev.to_csv(csv_dir / "events.csv", index=False)
    return str(pq_dir), str(csv_dir)


def test_map_partials_csv_fallback(dual_dir):
    """map_partials over CSV streams through the Dataset path."""
    import pyarrow as pa

    from datapact_ray.shuffle import map_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby("event_type", sort=False)["value"].agg(["count", "sum"])
        return g.reset_index().rename(columns={"count": "n", "sum": "s"})

    outs = []
    for base, fname in ((dual_dir[0], "events.parquet"), (dual_dir[1], "events.csv")):
        parts = map_partials(
            f"{base}/{fname}", ["event_type", "value"], None, partial
        )
        outs.append(
            parts.groupby("event_type")
            .agg(n=("n", "sum"), s=("s", "sum"))
            .sort_index()
        )
    pd.testing.assert_frame_equal(outs[0], outs[1], atol=1e-9)


def test_fused_grouped_frames_csv_fallback(dual_dir):
    """The whole-bucket reduce falls back to the streaming shuffle for
    CSV and matches the parquet fast path exactly."""
    import pyarrow as pa

    from datapact_ray.pipelines.dedup import _fused_grouped_frames
    from datapact_ray.pipelines.windows import _bucket_of

    nb = 7

    def project(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas().dropna(subset=["user_id"])
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "value": df["value"].astype("float64"),
                "__bucket": _bucket_of(
                    df["user_id"].to_numpy(dtype=np.int64), nb
                ),
            }
        )

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "users": [int(g["user_id"].nunique())],
                "rows": [len(g)],
            }
        )

    outs = []
    for base, fname in ((dual_dir[0], "events.parquet"), (dual_dir[1], "events.csv")):
        parts = _fused_grouped_frames(
            [(f"{base}/{fname}", ["user_id", "value"], None, project)],
            nb,
            reduce_fn,
        )
        outs.append((int(parts["users"].sum()), int(parts["rows"].sum())))
    assert outs[0] == outs[1]


def test_missing_input_raises(dual_dir):
    """A missing input must FAIL loudly — a silent empty file list would
    make every downstream check vacuously green."""
    from datapact_ray.io import list_parquet_files

    with pytest.raises(FileNotFoundError):
        list_parquet_files(f"{dual_dir[1]}/events.parquet")  # csv dir
    with pytest.raises(FileNotFoundError):
        from datapact_ray.shuffle import map_partials

        map_partials(
            f"{dual_dir[1]}/nonexistent.parquet", None, None, lambda t: None
        )
