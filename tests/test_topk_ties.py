"""Tie-safety of the local top-k prune.

topk_orders prunes each batch to rows >= its local 10th-largest price;
a boundary price shared by MANY rows must keep every tied row in the
candidate set so the merge can break ties on o_orderkey exactly like
ROW_NUMBER() OVER (ORDER BY price DESC, key ASC). These fixtures put
heavy ties at the boundary and spread the smallest tied keys across
blocks, which a naive head(k)-after-argpartition prune gets wrong.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datapact_ray.pipelines.relational import group_topk_orders, topk_orders


@pytest.fixture(scope="module")
def tied_orders_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tied_orders")
    rng = np.random.default_rng(11)
    n = 5000
    # 60% of rows share one of three prices; keys shuffled so the
    # smallest tied keys land in different row groups / blocks
    prices = rng.choice(
        [900.0, 900.0, 900.0, 850.0, 850.0, 800.0, rng.uniform(1, 700)], n
    ).astype(np.float64)
    keys = rng.permutation(n).astype(np.int64)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM"])[np.arange(n) % 3]
    df = pd.DataFrame(
        {
            "o_orderkey": keys,
            "o_totalprice": prices,
            "o_orderpriority": prios,
        }
    )
    # small row groups force many blocks -> boundary ties cross blocks
    df.to_parquet(d / "orders.parquet", row_group_size=256)
    return str(d)


def test_topk_orders_exact_under_heavy_ties(tied_orders_dir):
    got = topk_orders(tied_orders_dir)
    want = duckdb.sql(
        f"""
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM read_parquet('{tied_orders_dir}/orders.parquet')
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_group_topk_exact_under_heavy_ties(tied_orders_dir):
    got = group_topk_orders(tied_orders_dir)
    want = duckdb.sql(
        f"""
        SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk,
               o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey ASC) AS rnk
              FROM read_parquet('{tied_orders_dir}/orders.parquet'))
        WHERE rnk <= 3 ORDER BY o_orderpriority, rnk
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
