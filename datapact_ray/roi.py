"""Throughput grading / ROI narrative metrics.

Parity with the reference's ``roi_calculator.py``:

* ``PerformanceBenchmarker`` grading (``roi_calculator.py:123-151``) —
  the same records/sec → grade thresholds, fed by this engine's own run
  metrics (rows validated per task runtime).
* The ROI narrative (``roi_calculator.py:13-118``): quality KPIs,
  monthly savings projection and annual ROI, with the reference's cost
  assumptions as defaults. These feed the run report (``report.py``),
  the analog of the reference's dashboard summary panels."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class QualityMetrics:
    """Run-level quality KPIs (``roi_calculator.py:13-42``)."""

    total_validations: int
    passed_validations: int
    failed_validations: int
    critical_failures: int
    tables_validated: int
    records_processed: int
    avg_runtime_seconds: float
    data_quality_score: float

    @property
    def success_rate(self) -> float:
        if self.total_validations == 0:
            return 0.0
        return self.passed_validations / self.total_validations * 100

    @property
    def failure_rate(self) -> float:
        return 100 - self.success_rate

    @property
    def critical_failure_rate(self) -> float:
        if self.total_validations == 0:
            return 0.0
        return self.critical_failures / self.total_validations * 100


@dataclass
class RoiAssumptions:
    """Cost-model assumptions (reference defaults,
    ``roi_calculator.py:46-62``)."""

    avg_data_incident_cost: float = 150_000.0
    manual_validation_hour_cost: float = 125.0
    compliance_violation_cost: float = 500_000.0
    manual_validation_hours_weekly: float = 40.0
    annual_revenue: float = 1_000_000_000.0
    data_dependent_revenue_pct: float = 0.30


def monthly_savings(
    m: QualityMetrics, a: RoiAssumptions | None = None
) -> dict[str, float]:
    """``roi_calculator.py:64-101`` formulas."""
    a = a or RoiAssumptions()
    labor = a.manual_validation_hours_weekly * 4.33 * a.manual_validation_hour_cost
    incidents_prevented = m.critical_failures * 0.8
    incident_prevention = incidents_prevented * a.avg_data_incident_cost
    compliance = (
        a.compliance_violation_cost / 12 * 0.1 if m.data_quality_score >= 95 else 0.0
    )
    revenue_at_risk_monthly = a.annual_revenue * a.data_dependent_revenue_pct / 12
    revenue_protection = revenue_at_risk_monthly * (m.failure_rate / 100) * 0.05
    return {
        "labor_savings": labor,
        "incident_prevention": incident_prevention,
        "compliance_savings": compliance,
        "revenue_protection": revenue_protection,
        "total_monthly_savings": labor
        + incident_prevention
        + compliance
        + revenue_protection,
    }


def annual_roi(
    m: QualityMetrics,
    annual_license_cost: float = 250_000.0,
    a: RoiAssumptions | None = None,
) -> dict[str, float]:
    """``roi_calculator.py:99-118`` formulas."""
    monthly = monthly_savings(m, a)["total_monthly_savings"]
    annual_savings = monthly * 12
    return {
        "annual_savings": annual_savings,
        "annual_cost": annual_license_cost,
        "net_benefit": annual_savings - annual_license_cost,
        "roi_percentage": (annual_savings - annual_license_cost)
        / annual_license_cost
        * 100,
        "payback_period_months": (
            annual_license_cost / monthly if monthly else float("inf")
        ),
        "five_year_value": (annual_savings - annual_license_cost) * 5,
    }


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


def _calculate_percentile(score: float) -> int:
    """Percentile ranking brackets (``roi_calculator.py:204-217``)."""
    if score >= 99.5:
        return 99
    if score >= 97.0:
        return 90
    if score >= 95.0:
        return 75
    if score >= 93.0:
        return 50
    if score >= 90.0:
        return 25
    return 10


def benchmark_against_industry(m: QualityMetrics) -> dict:
    """Quality-tier + percentile benchmark
    (``roi_calculator.py:153-200``; the reference's hard-coded industry
    reference points reproduced verbatim)."""
    quality_tier = "Below Standard"
    if m.data_quality_score >= 99.5:
        quality_tier = "World Class"
    elif m.data_quality_score >= 97.0:
        quality_tier = "Enterprise Grade"
    elif m.data_quality_score >= 95.0:
        quality_tier = "Industry Standard"
    return {
        "quality_tier": quality_tier,
        "percentile_rank": _calculate_percentile(m.data_quality_score),
        "improvement_potential": 99.5 - m.data_quality_score,
        "industry_comparison": {
            "your_score": m.data_quality_score,
            "industry_average": 94.5,
            "top_performer": 99.8,
            "competitive_advantage": m.data_quality_score > 94.5,
        },
    }


def generate_executive_summary(
    m: QualityMetrics,
    a: RoiAssumptions | None = None,
    annual_license_cost: float = 250_000.0,
    generated_at: str | None = None,
) -> str:
    """The reference's full executive narrative text
    (``roi_calculator.py:222-293``): KPIs, validation metrics, financial
    impact with the savings breakdown, and the four conditional
    recommendation lines."""
    from datetime import datetime

    a = a or RoiAssumptions()
    savings = monthly_savings(m, a)
    roi = annual_roi(m, annual_license_cost, a)
    perf = benchmark_against_industry(m)
    stamp = generated_at or datetime.now().strftime("%Y-%m-%d %H:%M")

    summary = f"""
    EXECUTIVE DATA QUALITY REPORT
    =====================================
    Generated: {stamp}

    KEY PERFORMANCE INDICATORS
    --------------------------
    Data Quality Score: {m.data_quality_score:.1f}%
    Quality Tier: {perf["quality_tier"]}
    Industry Percentile: Top {100 - perf["percentile_rank"]}%

    VALIDATION METRICS
    ------------------
    Total Validations: {m.total_validations:,}
    Success Rate: {m.success_rate:.2f}%
    Critical Issues: {m.critical_failures}
    Tables Monitored: {m.tables_validated}
    Records Processed: {m.records_processed:,}

    FINANCIAL IMPACT
    ----------------
    Monthly Savings: ${savings["total_monthly_savings"]:,.0f}
      - Automation Savings: ${savings["labor_savings"]:,.0f}
      - Incident Prevention: ${savings["incident_prevention"]:,.0f}
      - Compliance Protection: ${savings["compliance_savings"]:,.0f}
      - Revenue Protection: ${savings["revenue_protection"]:,.0f}

    Annual ROI: {roi["roi_percentage"]:.0f}%
    Payback Period: {roi["payback_period_months"]:.1f} months
    5-Year Value: ${roi["five_year_value"]:,.0f}

    RECOMMENDATIONS
    ---------------
    """
    if m.data_quality_score < 95:
        summary += (
            "⚠️ URGENT: Data quality below enterprise standard. "
            "Immediate action required.\n"
        )
    if m.critical_failures > 0:
        summary += (
            f"⚠️ ADDRESS: {m.critical_failures} critical issues "
            "require resolution.\n"
        )
    if m.success_rate < 90:
        summary += (
            "⚠️ REVIEW: Success rate indicates systemic data quality "
            "issues.\n"
        )
    if m.data_quality_score >= 99:
        summary += "✅ EXCELLENT: Maintain current data quality practices.\n"
    return summary


def format_roi_dashboard(
    m: QualityMetrics,
    a: RoiAssumptions | None = None,
    annual_license_cost: float = 250_000.0,
) -> dict:
    """Dashboard KPI-card dict (``roi_calculator.py:296-322``)."""
    a = a or RoiAssumptions()
    savings = monthly_savings(m, a)
    roi = annual_roi(m, annual_license_cost, a)
    return {
        "kpi_cards": [
            {
                "title": "Monthly Savings",
                "value": f"${savings['total_monthly_savings']:,.0f}",
                "trend": "+15.3%",
                "icon": "💰",
            },
            {
                "title": "ROI",
                "value": f"{roi['roi_percentage']:.0f}%",
                "trend": "Exceeds Target",
                "icon": "📈",
            },
            {
                "title": "Payback Period",
                "value": f"{roi['payback_period_months']:.1f} months",
                "trend": "Fast",
                "icon": "⏱️",
            },
            {
                "title": "5-Year Value",
                "value": f"${roi['five_year_value'] / 1_000_000:.1f}M",
                "trend": "Projected",
                "icon": "🎯",
            },
        ],
        "savings_breakdown": {
            "categories": list(savings.keys())[:-1],
            "values": list(savings.values())[:-1],
        },
        "executive_metrics": {
            "incidents_prevented_monthly": int(m.critical_failures * 0.8),
            "compliance_risk_reduction": "90%"
            if m.data_quality_score >= 95
            else "Limited",
            "productivity_gain": (
                f"{a.manual_validation_hours_weekly * 4.33:.0f} hours/month"
            ),
            "decision_confidence": f"{m.data_quality_score:.1f}%",
        },
    }
