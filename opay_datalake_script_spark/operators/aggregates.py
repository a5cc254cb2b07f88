"""Grouped aggregation operators (SURVEY.md §2-D).

Reference analog: Hive GROUP BY report queries with map-side (partial)
aggregation; grouping-sets multi-level reports; ``sum(CASE WHEN ...)``
manual pivots (SURVEY.md §2-D provenance column). Spark runs
partial->final hash aggregation automatically; every query here is plain
DataFrame/SQL so Catalyst keeps the whole pipeline in whole-stage codegen.

Determinism (SURVEY.md §5.3): every float aggregate is rounded identically
in the engine and in the oracle SQL; DuckDB integer sums are cast to
BIGINT to match Spark's long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


@register(
    "d_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                          AS sum_qty,
           round(sum(l_extendedprice), 2)                     AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc,
           round(avg(l_quantity), 6)                          AS avg_qty,
           count(*)                                           AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary group-agg on lineitem (the flagship; TPC-H Q1 shape).

    One shuffle on the (low-cardinality) grouping keys; partial aggregation
    happens map-side so the shuffle carries 6 rows per input partition, not
    60k — the plan that survives a 100x scale-up.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("cnt"),
        )
    )
