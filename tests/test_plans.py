"""Physical-plan quality gates: the properties that make the engine hold
at 100 TB must stay visible in `.explain` output — pushdown, pruning,
bounded shuffles, broadcasts — so they are asserted here as regressions."""

import pyspark.sql.functions as F

import __spark_entry__ as E
from osm_pbf2json_spark.operators import spatial


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_agg_pricing_pushdown_and_pruning(spark, sf_dir):
    df = E.q_agg_pricing(spark, sf_dir)
    plan = _plan(df)
    # filter pushed to the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: unused columns are not read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_flagship_rollup_single_exchange(spark, sf_dir):
    pts = E._points(spark, sf_dir)
    rows = [{"key": "A", "polygons": [[E.POLY_A + E.POLY_A[:1]]]}]
    df = spatial.pip_tile_rollup(pts, rows)
    plan = _plan(df)
    # kernel-side combine → exactly one Exchange (the final tiny agg)
    assert plan.count("Exchange") == 1


def test_pip_broadcast_no_exchange(spark, sf_dir):
    pts = E._points(spark, sf_dir)
    rows = [{"key": "A", "polygons": [[E.POLY_A + E.POLY_A[:1]]]}]
    df = spatial.pip_join_broadcast(pts, rows)
    assert "Exchange" not in _plan(df)


def test_closure_uses_broadcast_joins(spark, sf_dir):
    df = E.q_s2_closure(spark, sf_dir)
    # semi-join closure over dimension-sized sides plans as broadcast
    assert "BroadcastHashJoin" in _plan(df)


def test_pair_dedup_pushdown_partial_agg(spark, sf_dir):
    df = E.q_o2_pair_dedup(spark, sf_dir)
    plan = _plan(df)
    # predicate pushed to scan; distinct planned as partial+final HashAggregate
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
    assert plan.count("HashAggregate") == 2
    assert "pythonUDF" not in plan


def test_filter_dsl_is_codegen(spark, sf_dir):
    df = E.q_f1_filter_dsl(spark, sf_dir)
    plan = _plan(df)
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
