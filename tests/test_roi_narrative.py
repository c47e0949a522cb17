"""Executive narrative / dashboard parity with the reference
roi_calculator.py:153-322 (tiers, percentiles, narrative lines,
KPI-card shapes)."""

from datapact_ray.roi import (
    QualityMetrics,
    benchmark_against_industry,
    format_roi_dashboard,
    generate_executive_summary,
)


def _metrics(score=99.2, crit=0, fails=1):
    total = 50
    return QualityMetrics(
        total_validations=total,
        passed_validations=total - fails,
        failed_validations=fails,
        critical_failures=crit,
        tables_validated=12,
        records_processed=5_000_000,
        avg_runtime_seconds=3.5,
        data_quality_score=score,
    )


def test_quality_tiers_and_percentiles():
    assert benchmark_against_industry(_metrics(99.6))["quality_tier"] == "World Class"
    assert benchmark_against_industry(_metrics(97.5))["quality_tier"] == "Enterprise Grade"
    assert benchmark_against_industry(_metrics(95.0))["quality_tier"] == "Industry Standard"
    assert benchmark_against_industry(_metrics(90.0))["quality_tier"] == "Below Standard"
    assert benchmark_against_industry(_metrics(99.6))["percentile_rank"] == 99
    assert benchmark_against_industry(_metrics(93.5))["percentile_rank"] == 50
    assert benchmark_against_industry(_metrics(80.0))["percentile_rank"] == 10
    cmp = benchmark_against_industry(_metrics(96.0))["industry_comparison"]
    assert cmp["competitive_advantage"] is True
    assert cmp["industry_average"] == 94.5


def test_narrative_recommendation_lines():
    txt = generate_executive_summary(_metrics(score=99.2), generated_at="2026-01-01 00:00")
    assert "EXECUTIVE DATA QUALITY REPORT" in txt
    assert "Quality Tier: Enterprise Grade" in txt
    assert "✅ EXCELLENT" in txt
    assert "URGENT" not in txt

    bad = generate_executive_summary(
        _metrics(score=88.0, crit=3, fails=20), generated_at="2026-01-01 00:00"
    )
    assert "⚠️ URGENT" in bad
    assert "⚠️ ADDRESS: 3 critical issues" in bad
    assert "⚠️ REVIEW" in bad
    assert "EXCELLENT" not in bad


def test_narrative_figures_match_cost_model():
    m = _metrics(score=99.2)
    txt = generate_executive_summary(m, generated_at="2026-01-01 00:00")
    # labor 40h * 4.33 * $125 = $21,650; compliance 500k/12*0.1 = $4,167
    assert "Automation Savings: $21,650" in txt
    assert "Compliance Protection: $4,167" in txt
    assert "Records Processed: 5,000,000" in txt


def test_dashboard_kpi_cards_shape():
    dash = format_roi_dashboard(_metrics())
    assert [c["title"] for c in dash["kpi_cards"]] == [
        "Monthly Savings",
        "ROI",
        "Payback Period",
        "5-Year Value",
    ]
    assert dash["savings_breakdown"]["categories"] == [
        "labor_savings",
        "incident_prevention",
        "compliance_savings",
        "revenue_protection",
    ]
    assert dash["executive_metrics"]["compliance_risk_reduction"] == "90%"
    assert dash["executive_metrics"]["productivity_gain"] == "173 hours/month"
