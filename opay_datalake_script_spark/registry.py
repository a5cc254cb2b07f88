"""Query registry: maps SURVEY.md §2 query IDs to builder functions and
(for the oracle-checkable ones) to equivalent ANSI SQL for DuckDB.

The reference's unit of computation was one Airflow task rendering one
HiveQL script (SURVEY.md §3.1); ours is one pure function
``(spark, sf_dir) -> DataFrame`` registered here. Idempotent by
construction — the lesson adopted from the reference's rerun-safe
``INSERT OVERWRITE`` discipline (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "opay_datalake_script_spark.sources.io",
    "opay_datalake_script_spark.operators.relational",
    "opay_datalake_script_spark.operators.joins",
    "opay_datalake_script_spark.operators.aggregates",
    "opay_datalake_script_spark.operators.windows",
    "opay_datalake_script_spark.operators.reports",
    "opay_datalake_script_spark.operators.hiveql",
    "opay_datalake_script_spark.functions.scalar",
    "opay_datalake_script_spark.functions.udfs",
    "opay_datalake_script_spark.streaming.jobs",
    "opay_datalake_script_spark.llmdata.dedup",
    "opay_datalake_script_spark.llmdata.similarity",
    "opay_datalake_script_spark.llmdata.textstats",
    "opay_datalake_script_spark.llmdata.multimodal",
    "opay_datalake_script_spark.llmdata.sampling",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under a §2 query ID.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent; omit it for
    ops that are not SQL-expressible (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> dict[str, QueryFn]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        import_module(mod)
    return QUERIES
