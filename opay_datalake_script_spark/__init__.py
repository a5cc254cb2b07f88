"""PySpark-native analytics engine with the query/data-processing
capabilities of the ``lishuailishuai/Opay_datalake-script`` reference
(Airflow-orchestrated HiveQL ETL over a Hadoop lake — see SURVEY.md §0.3).

Everything here is a fresh Spark-first design: declarative DataFrame/SQL
plans optimized by Catalyst/Tungsten/AQE, vectorized Pandas UDFs where
built-ins can't express the semantics, and Structured Streaming for the
incremental paths. No code is ported from the reference (its checkout was
empty at survey time; see SURVEY.md §0.1).

Public surface:
    get_spark()          -- configured SparkSession factory
    load(spark, sf, t)   -- schema-checked parquet table loader
    QUERIES / ORACLES    -- the SURVEY.md §2 operator registry
"""

from .session import get_spark
from .sources.io import load
from .registry import QUERIES, ORACLES, load_all_queries

__all__ = ["get_spark", "load", "QUERIES", "ORACLES", "load_all_queries"]
