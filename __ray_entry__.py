"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation suite over
``/root/testdata/sf0.001`` and returns the results table (one row per
validation task, reference result-row shape). ``queries()`` /
``oracle_sql()`` expose each implemented operator from SURVEY.md §2 with
its DuckDB-checkable counterpart.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: full validation suite on /root/testdata/sf0.001.

    Tasks: a clean self-pair over orders (count / row-hash / null / agg
    checks, all expected PASS), composite-key uniqueness over lineitem,
    and referential integrity orders→customer + lineitem→orders.
    Returns the results table as a pandas DataFrame (driver checks
    rows >= 0 and a stable schema).
    """
    import pandas as pd

    from datapact_ray.config import (
        AggValidation,
        AggValidationDetail,
        ReferentialCheck,
        ValidationSuite,
        ValidationTask,
    )
    from datapact_ray.runner import RunConfig, run_suite

    sf_dir = "/root/testdata/sf0.001"
    results_dir = tempfile.mkdtemp(prefix="datapact_ray_entry_")
    try:
        suite = ValidationSuite(
            validations=[
                ValidationTask(
                    task_key="orders_selfcheck",
                    source_path=f"{sf_dir}/orders.parquet",
                    target_path=f"{sf_dir}/orders.parquet",
                    primary_keys=["o_orderkey"],
                    count_tolerance=0.0,
                    pk_row_hash_check=True,
                    null_validation_tolerance=0.0,
                    null_validation_columns=["o_orderstatus"],
                    agg_validations=[
                        AggValidation(
                            column="o_totalprice",
                            validations=[
                                AggValidationDetail(agg="SUM", tolerance=0.0),
                                AggValidationDetail(agg="AVG", tolerance=0.0),
                            ],
                        )
                    ],
                    uniqueness_columns=["o_orderkey"],
                    uniqueness_tolerance=0.0,
                    business_domain="Retail",
                    business_priority="High",
                ),
                ValidationTask(
                    task_key="lineitem_keys_and_refs",
                    source_path=f"{sf_dir}/lineitem.parquet",
                    target_path=f"{sf_dir}/lineitem.parquet",
                    count_tolerance=0.0,
                    uniqueness_columns=["l_orderkey", "l_linenumber"],
                    uniqueness_tolerance=1.0,  # testdata has seeded duplicates
                    referential=[
                        ReferentialCheck(
                            columns=["l_orderkey"],
                            ref_path=f"{sf_dir}/orders.parquet",
                            ref_columns=["o_orderkey"],
                            side="source",
                        )
                    ],
                ),
            ]
        )
        summary = run_suite(suite, RunConfig(results_dir=results_dir, run_id=1))
        return pd.DataFrame(summary.rows)
    finally:
        shutil.rmtree(results_dir, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from datapact_ray.pipelines.relational import QUERIES as REL

    out: dict[str, Callable[[str], Any]] = {}
    out.update(REL)
    try:
        from datapact_ray.pipelines.text import QUERIES as TEXT

        out.update(TEXT)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.dedup import QUERIES as DEDUP

        out.update(DEDUP)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.ann import QUERIES as ANN

        out.update(ANN)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.windows import QUERIES as WIN

        out.update(WIN)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.multimodal import QUERIES as MM

        out.update(MM)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.selection import QUERIES as SEL

        out.update(SEL)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.stats import QUERIES as STATS

        out.update(STATS)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.curation import QUERIES as CUR

        out.update(CUR)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.retrieval import QUERIES as RETR

        out.update(RETR)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.quality import QUERIES as QUAL

        out.update(QUAL)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omitted for ops that are
    not SQL-expressible — driver records a rows-only check for those)."""
    from datapact_ray.pipelines.relational import ORACLE_SQL as REL

    out: dict[str, str] = {}
    out.update(REL)
    try:
        from datapact_ray.pipelines.text import ORACLE_SQL as TEXT

        out.update(TEXT)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.dedup import ORACLE_SQL as DEDUP

        out.update(DEDUP)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.ann import ORACLE_SQL as ANN

        out.update(ANN)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.windows import ORACLE_SQL as WIN

        out.update(WIN)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.multimodal import ORACLE_SQL as MM

        out.update(MM)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.selection import ORACLE_SQL as SEL

        out.update(SEL)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.stats import ORACLE_SQL as STATS

        out.update(STATS)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.curation import ORACLE_SQL as CUR

        out.update(CUR)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.retrieval import ORACLE_SQL as RETR

        out.update(RETR)
    except ImportError:
        pass
    try:
        from datapact_ray.pipelines.quality import ORACLE_SQL as QUAL

        out.update(QUAL)
    except ImportError:
        pass
    return out
