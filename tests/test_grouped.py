"""applyInPandas grouped-map operator: equivalence with the native
window-function form (same math, different execution path)."""

from __future__ import annotations

from les_etl_pipeline_spark.catalog import table
from les_etl_pipeline_spark.operators.grouped import zscore_grouped_pandas
from les_etl_pipeline_spark.queries.relational3 import grouped_zscore_native


def test_pandas_zscore_matches_native(spark, sf_dir):
    native = {
        r["o_orderkey"]: r["zscore"]
        for r in grouped_zscore_native(spark, sf_dir).collect()
    }
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    pandas_out = {
        r["key"]: r["zscore"]
        for r in zscore_grouped_pandas(orders, "o_orderstatus", "o_totalprice").collect()
    }
    assert native.keys() == pandas_out.keys()
    # native output is rounded to 4dp; pandas is raw -> tolerance half a step
    for k, v in native.items():
        assert abs(v - pandas_out[k]) <= 5.1e-5, k


def test_pandas_zscore_plan_uses_arrow(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    plan = (
        zscore_grouped_pandas(orders, "o_orderstatus", "o_totalprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan
