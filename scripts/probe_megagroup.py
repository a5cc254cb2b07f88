"""Adversarial few-giant-groups probe for `grouped_row_number`
(r11 companion to probe_megabucket.py): ONE dominant group — the
celebrity-source / single-domain-corpus shape — ranked by

  current — grouped_row_number (range-partitioned global rank over the
            group-prefixed total order + offset subtraction), and
  legacy  — the pre-r11 shape: row_number() OVER (PARTITION BY g
            ORDER BY ...), which sorts the whole group in one task.

Max single-task duration comes from the Spark UI REST API, per-run
stage isolation, warmup excluded — same protocol as the bucket probe.

Usage: python scripts/probe_megagroup.py [rows ...]
       (default: 1_000_000 4_000_000)
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

from opay_datalake_script_spark.operators.relational import (  # noqa: E402
    grouped_row_number,
)


def current(df):
    return grouped_row_number(df, ["g"], [F.md5(F.col("v").cast("string")), "v"])


def legacy(df):
    w = W.partitionBy("g").orderBy(F.md5(F.col("v").cast("string")), "v")
    return df.withColumn("grn", F.row_number().over(w).cast("long"))


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as fh:
        return json.loads(fh.read().decode())


def completed_stage_ids(ui: str, app_id: str) -> set:
    return {
        (st["stageId"], st["attemptId"])
        for st in _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    }


def max_task_seconds(ui: str, app_id: str, skip: set) -> float:
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
    sizes = [int(a.replace("_", "")) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    assert ui, "Spark UI did not come up; the probe cannot measure tasks"
    app_id = spark.sparkContext.applicationId

    warm = spark.range(2000).select(F.lit("w").alias("g"), F.col("id").alias("v"))
    current(warm).count()
    legacy(warm).count()

    for rows in sizes:
        # 95% of rows in ONE group, the rest across 9 small ones.
        mega = spark.range(rows).select(
            F.when(F.col("id") % 20 < 19, "celebrity")
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 9).cast("string")))
            .alias("g"),
            F.col("id").alias("v"),
        )
        for mode, fn in (("current", current), ("legacy", legacy)):
            seen = completed_stage_ids(ui, app_id)
            t0 = time.time()
            n = fn(mega).where(F.col("grn") % 97 == 0).count()
            row = {
                "rows": rows,
                "mode": mode,
                "wall_s": round(time.time() - t0, 2),
                "n_out": n,
                "max_task_s": round(max_task_seconds(ui, app_id, seen), 2),
            }
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
