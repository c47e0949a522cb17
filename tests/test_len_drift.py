"""derived: str_len drift — per-row character-length distribution of a
string column through the profile t-digest. The truncation detector: a
row-hash mismatch says WHICH turns differ, the length drift says HOW."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from datapact_ray.config import DriftCheck, ValidationSuite, ValidationTask
from datapact_ray.runner import RunConfig, run_suite


def _write(path, texts):
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, path)


def test_str_len_drift_detects_truncation(tmp_path):
    rng = np.random.default_rng(7)
    src_texts = ["x" * int(n) for n in rng.integers(50, 200, size=2000)]
    tgt_texts = [t[:5] if i % 2 == 0 else t for i, t in enumerate(src_texts)]
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(sp, src_texts)
    _write(tp, tgt_texts)

    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=tp,
        drift=[DriftCheck(column="text", metric="ks", derived="str_len",
                          threshold=0.05)],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    v = s.results[0].payload["drift_validation_text_str_len_ks"]
    assert v["status"] == "FAIL"
    # engine KS (t-digest approximation) vs exact two-sample ECDF KS
    a = np.sort([len(t) for t in src_texts])
    b = np.sort([len(t) for t in tgt_texts])
    grid = np.union1d(a, b)
    ecdf_a = np.searchsorted(a, grid, side="right") / len(a)
    ecdf_b = np.searchsorted(b, grid, side="right") / len(b)
    exact = np.abs(ecdf_a - ecdf_b).max()
    got = float(v["statistic"])
    assert abs(got - exact) < 0.02, (got, exact)


def test_str_len_drift_self_pair_passes(tmp_path):
    texts = ["y" * (10 + i % 40) for i in range(500)]
    sp = str(tmp_path / "s.parquet")
    _write(sp, texts)
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=sp,
        drift=[
            DriftCheck(column="text", metric="ks", derived="str_len"),
            DriftCheck(column="text", metric="psi", derived="str_len"),
        ],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    p = s.results[0].payload
    assert p["drift_validation_text_str_len_ks"]["status"] == "PASS"
    assert p["drift_validation_text_str_len_psi"]["status"] == "PASS"
    assert s.results[0].status == "SUCCESS"


def test_str_len_utf8_codepoints_not_bytes(tmp_path):
    # 'é'*10 is 10 characters / 20 octets: utf8_length must count chars
    sp, tp = str(tmp_path / "s.parquet"), str(tmp_path / "t.parquet")
    _write(sp, ["é" * 10] * 200)
    _write(tp, ["a" * 10] * 200)  # same CHARACTER length
    task = ValidationTask(
        task_key="t",
        source_path=sp,
        target_path=tp,
        drift=[DriftCheck(column="text", metric="ks", derived="str_len")],
    )
    s = run_suite(
        ValidationSuite(validations=[task]),
        RunConfig(results_dir=str(tmp_path / "out"), run_id=1),
    )
    v = s.results[0].payload["drift_validation_text_str_len_ks"]
    assert v["status"] == "PASS"  # identical length distributions
