"""SparkSession factory with the engine's standard configuration.

Reference analog: the Hive/Presto session settings the Opay DAGs relied on
(map-side aggregation, auto mapjoin, dynamic partition overwrite) — here
expressed as their Spark equivalents (SURVEY.md §4 table). Config choices:

* UTC session timezone: fixture timestamps are timezone-naive; DuckDB (the
  correctness oracle) treats them as naive/UTC, so Spark must agree
  (SURVEY.md §5.3-4).
* Arrow enabled: all Python interop (toPandas, pandas UDFs) is
  Arrow-batched, never row-at-a-time pickling.
* shuffle.partitions=32 + AQE: at local/bench scale, 200 default shuffle
  partitions is pure scheduling overhead; AQE coalesces and re-plans at
  runtime, and at cluster scale handles skew joins.
* dynamic partition overwrite: the Spark equivalent of Hive
  ``INSERT OVERWRITE ... PARTITION`` the reference used for idempotent
  daily reloads.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "opay-datalake-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or '*'.
    Safe to call repeatedly: returns the active session if one exists.
    ``shuffle_partitions=None`` means "caller has no opinion": a new
    session gets DEFAULT_SHUFFLE_PARTITIONS, but a pre-existing active
    session (possibly built by the bench/driver harness with its own
    deliberate width) is left untouched.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        # Apply ONLY confs the caller explicitly asked for; mutating a
        # session we did not create would override its owner's settings.
        import warnings

        requested = dict(extra_conf or {})
        if shuffle_partitions is not None:
            requested["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
        for key, val in requested.items():
            try:
                active.conf.set(key, val)
            except Exception:
                warnings.warn(
                    f"get_spark: conf {key!r} is static and the session is "
                    "already running; value ignored",
                    stacklevel=2,
                )
        return active
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # events.parquet stores ts as TIMESTAMP(NANOS) which Spark's reader
        # rejects; read it as long and convert in io.load (ns -> us).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
