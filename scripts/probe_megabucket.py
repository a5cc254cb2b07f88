"""Adversarial-width degeneracy probe for `capped_bucket_pairs`
(VERDICT r10 items 1+3): a synthetic single (band, bucket) group far
wider than anything the fixtures reach, measuring wall time, candidate
volume, and — the r10 finding — the MAX SINGLE TASK duration, which is
what a window partitioned by (band, bucket) concentrates and what the
r11 aggregate-sizing + chunked-chain rewrite is meant to bound.

Two modes per width:
  current  — the shipped `capped_bucket_pairs` (groupBy sizing + join
             back, chains chunked at CHAIN_CHUNK_ROWS).
  legacy   — the r10 shape, reconstructed inline: count/min OVER
             (PARTITION BY band, bucket) sizing and an UNCHUNKED chain
             window per (band, bucket, salt) — the whole mega-bucket
             in one sort task per salt.

Max-task-duration comes from the Spark UI REST API (the probe enables
the UI; tests keep it off), aggregated across every stage of the job.

Usage: python scripts/probe_megabucket.py [width ...]
       (default widths: 100_000 1_000_000)
Prints one JSON line per (width, mode) with wall_s, n_pairs,
max_task_s, and the widest single sort any task performed.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from opay_datalake_script_spark.llmdata.dedup import (  # noqa: E402
    LSH_BUCKET_CAP,
    LSH_CHAIN_SALTS,
    capped_bucket_pairs,
)


def legacy_capped_bucket_pairs(buckets, max_bucket_size=LSH_BUCKET_CAP):
    """The r10 implementation, verbatim shape: window sizing + unchunked
    salted-chain windows. Kept ONLY for this probe's before/after."""
    w = W.partitionBy("band", "bucket")
    sized = buckets.withColumn("bsz", F.count("*").over(w)).withColumn(
        "hub", F.min("doc_id").over(w)
    )
    a = sized.where(
        (F.col("bsz") <= max_bucket_size) | (F.col("doc_id") == F.col("hub"))
    ).select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = sized.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    star = (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    ws = W.partitionBy("band", "bucket", "salt").orderBy(
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("salt"))), "doc_id"
    )
    chain = (
        sized.where(F.col("bsz") > max_bucket_size)
        .select(
            "doc_id", "band", "bucket",
            F.explode(F.array(*[F.lit(s) for s in range(LSH_CHAIN_SALTS)])).alias(
                "salt"
            ),
        )
        .withColumn("nxt", F.lead("doc_id").over(ws))
        .where(F.col("nxt").isNotNull())
        .select(
            F.least("doc_id", "nxt").alias("doc_a"),
            F.greatest("doc_id", "nxt").alias("doc_b"),
        )
    )
    return star.unionByName(chain).distinct()


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as fh:
        return json.loads(fh.read().decode())


def completed_stage_ids(ui: str, app_id: str) -> set:
    return {
        (st["stageId"], st["attemptId"])
        for st in _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    }


def max_task_seconds(ui: str, app_id: str, skip: set) -> float:
    """Max executorRunTime of any single task across the completed
    stages NOT in `skip` (ms -> s) — i.e. only the stages the run under
    measurement added."""
    worst = 0.0
    for sid, att in completed_stage_ids(ui, app_id) - skip:
        try:
            summ = _rest(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}"
                "/taskSummary?quantiles=1.0"
            )
            worst = max(worst, summ["executorRunTime"][-1] / 1000.0)
        except Exception:
            continue
    return worst


def main() -> None:
    widths = [int(a.replace("_", "")) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the ACTUALLY-bound UI URL (review r11): Spark silently takes the
    # next free port when 4049 is busy, and a hardcoded URL would then
    # query some other app's REST API (404) or — worse — have every
    # stage lookup swallowed and report max_task_s=0.0 as if measured
    ui = spark.sparkContext.uiWebUrl
    assert ui, "Spark UI did not come up; the probe cannot measure tasks"
    app_id = spark.sparkContext.applicationId

    # Warmup: pay whole-stage-codegen/JIT once outside the measured
    # runs (the first measured mode otherwise absorbs ~8 s of warmup).
    warm = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit("w").alias("bucket"),
    )
    capped_bucket_pairs(warm).count()
    legacy_capped_bucket_pairs(warm).count()

    results = []
    for width in widths:
        # One degenerate bucket: every doc lands in the same (band,
        # bucket) — the boilerplate-family shape that survives exact
        # dedup. doc_ids are distinct, so chains/star have real work.
        mega = spark.range(width).select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("band"),
            F.lit("deadbeef").alias("bucket"),
        )
        for mode, fn in (("current", capped_bucket_pairs),
                         ("legacy", legacy_capped_bucket_pairs)):
            seen = completed_stage_ids(ui, app_id)
            t0 = time.time()
            n = fn(mega).count()
            wall = round(time.time() - t0, 2)
            worst = max_task_seconds(ui, app_id, seen)
            row = {
                "width": width,
                "mode": mode,
                "wall_s": wall,
                "n_pairs": n,
                "max_task_s": round(worst, 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
