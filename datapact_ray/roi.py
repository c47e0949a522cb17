"""Throughput grading / processing-speed metrics.

Parity with the reference's ``PerformanceBenchmarker``
(``/root/reference/datapact/roi_calculator.py:123-151``): the same
records/sec → grade thresholds, fed by this engine's own run metrics
(rows validated per task runtime). The surrounding ROI-narrative
calculators (savings projections, industry benchmarks) are dashboard
storytelling, out of engine scope — the grading is kept because it is
the reference's published performance yardstick (BASELINE.md)."""

from __future__ import annotations


def grade_throughput(records_per_second: float) -> str:
    """Reference thresholds, ``roi_calculator.py:139-151``."""
    if records_per_second >= 1_000_000:
        return "Enterprise Elite (1M+ rec/sec)"
    if records_per_second >= 100_000:
        return "Enterprise Standard (100K+ rec/sec)"
    if records_per_second >= 10_000:
        return "Business Grade (10K+ rec/sec)"
    if records_per_second >= 1_000:
        return "Department Grade (1K+ rec/sec)"
    return "Development Grade (<1K rec/sec)"


def processing_speed(records: int, runtime_seconds: float) -> dict:
    """``roi_calculator.py:123-137`` equivalent."""
    if runtime_seconds == 0:
        return {
            "records_per_second": 0.0,
            "millions_per_hour": 0.0,
            "throughput_grade": "N/A",
        }
    rps = records / runtime_seconds
    return {
        "records_per_second": round(rps, 2),
        "millions_per_hour": round(rps * 3600 / 1_000_000, 2),
        "throughput_grade": grade_throughput(rps),
    }
