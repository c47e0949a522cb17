"""Lakeview-shape visual spec (round-3 item #7): dashboard.json carries
the three-page widget layout; every widget references a written ds_*
dataset and only fields that exist in that dataset's frame."""

import json

import pandas as pd

from datapact_ray.dashboard import kpi_snapshot, layout_pages

_FIELD_KEYS = ("value_field", "x_field", "y_field", "category_field")


def test_layout_page_structure():
    pages = layout_pages()
    assert [p["name"] for p in pages] == [
        "main_page",
        "details_page",
        "performance_page",
    ]
    assert pages[0]["displayName"] == "Executive Data Quality Dashboard"
    main = pages[0]["layout"]
    assert len(main) == 14
    types = {w["type"] for w in main}
    assert {"COUNTER", "DONUT", "LINE", "BAR", "TABLE"} <= types
    for p in pages:
        for w in p["layout"]:
            pos = w["position"]
            assert {"x", "y", "width", "height"} <= set(pos)


def test_kpi_snapshot_counters():
    hist = pd.DataFrame(
        {
            "task_key": ["a", "b", "c", "a"],
            "status": ["SUCCESS", "FAILURE", "FAILURE", "FAILURE"],
            "job_start_ts": ["2026-01-02"] * 3 + ["2026-01-01"],
            "business_priority": ["High", "CRITICAL", "Low", "High"],
            "estimated_impact_usd": [100.0, 200.0, 50.0, 999.0],
            "expected_sla_hours": [4.0, 8.0, None, 1.0],
        }
    )
    k = kpi_snapshot(hist).iloc[0]
    # only the latest job_start_ts rows (3 of 4) are scoped
    assert k["total_tasks"] == 3 and k["tables_validated"] == 3
    assert k["passed_tasks"] == 1 and k["failed_tasks"] == 2
    assert k["success_rate_percent"] == 33.33
    assert k["data_quality_score"] == 0.3333
    assert k["critical_failures"] == 1
    assert k["potential_impact_usd"] == 350.0
    assert k["realized_impact_usd"] == 250.0
    assert kpi_snapshot(hist.iloc[0:0]).empty
