#!/usr/bin/env python
"""Mega-part degeneracy probe for the r12 t_q02 keeper conversion
(VERDICT r11 item 5, the probe-the-claim discipline of
probe_megabucket.py): ONE part with N suppliers — the shape real
TPC-H forbids (4 suppliers/part) but the synthetic fixtures already
trend toward (52 at sf0.1, growing with SF).

Two modes per width over the same synthetic (p_partkey, s_suppkey,
s_acctbal) catalog, auto-broadcast OFF so both run their at-scale
regime:

  window — the pre-r12 shape: min(s_acctbal) OVER (PARTITION BY
           p_partkey) + equality filter; the mega-part funnels into
           ONE window task.
  join   — the shipped shape: groupBy-min + join back; Catalyst folds
           the equality into the join, so the keeper executes as a
           composite-key (normalized s_acctbal, p_partkey) equi-join
           and the mega-part spreads across tasks by balance.

Both modes must return the IDENTICAL keeper set (asserted). Max single
task executorRunTime comes from the Spark UI REST API, counting only
the stages each run added (probe_megabucket.py helpers).

Usage: python scripts/probe_q2_megapart.py [width ...]
       (default widths: 100_000 1_000_000)
Prints one JSON line per (width, mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from probe_megabucket import completed_stage_ids, max_task_seconds  # noqa: E402

N_TIES = 8  # suppliers tied at the min balance per part


def catalog(spark, width: int):
    """One mega part (p_partkey=1) with `width` suppliers + 1000 normal
    parts with 4 suppliers each. Balances cycle so each part has
    N_TIES suppliers tied at its min — the keeper must return ALL of
    them. Generated distributed via range(); written nowhere."""
    mega = spark.range(width).select(
        F.lit(1).alias("p_partkey"),
        F.col("id").alias("s_suppkey"),
        # min balance 0.0 held by N_TIES suppliers (id % (width/N_TIES) == 0)
        (F.col("id") % (width // N_TIES)).cast("double").alias("s_acctbal"),
    )
    normal = spark.range(4000).select(
        (F.col("id") % 1000 + 2).alias("p_partkey"),
        (F.col("id") + 10_000_000).alias("s_suppkey"),
        (F.col("id") % 4).cast("double").alias("s_acctbal"),
    )
    return mega.unionAll(normal)


def keeper_window(cat):
    mn = F.min("s_acctbal").over(W.partitionBy("p_partkey"))
    return (
        cat.withColumn("mn", mn)
        .where(F.col("s_acctbal") == F.col("mn"))
        .select("p_partkey", "s_suppkey")
    )


def keeper_join(cat):
    mins = cat.groupBy("p_partkey").agg(F.min("s_acctbal").alias("mn"))
    return (
        cat.join(mins, "p_partkey")
        .where(F.col("s_acctbal") == F.col("mn"))
        .select("p_partkey", "s_suppkey")
    )


def main() -> None:
    widths = [int(a.replace("_", "")) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    assert ui, "Spark UI did not come up; the probe cannot measure tasks"
    app_id = spark.sparkContext.applicationId

    for width in widths:
        cat = catalog(spark, width)
        results = {}
        for mode, fn in [("window", keeper_window), ("join", keeper_join)]:
            seen = completed_stage_ids(ui, app_id)
            t0 = time.perf_counter()
            rows = fn(cat).toPandas()
            wall = time.perf_counter() - t0
            worst = max_task_seconds(ui, app_id, seen)
            key = sorted(map(tuple, rows[["p_partkey", "s_suppkey"]].values.tolist()))
            results[mode] = key
            print(
                json.dumps(
                    {
                        "width": width,
                        "mode": mode,
                        "wall_s": round(wall, 2),
                        "n_keepers": len(key),
                        "max_task_s": round(worst, 2),
                    }
                ),
                flush=True,
            )
        assert results["window"] == results["join"], (
            f"keeper sets diverge at width {width}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
