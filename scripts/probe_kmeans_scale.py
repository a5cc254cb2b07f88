"""Scale probe for the deterministic Lloyd fit (r11): synthesize N
64-dim vectors (hash-derived, no RNG — reproducible) and run the full
kmeans_fit (K=8, 3 iterations + final assignment), recording wall time
and the worst single-task duration from the Spark UI REST API (same
protocol as probe_megabucket/probe_megagroup, warmup excluded).

What the numbers must show for the 100 TB story: wall grows ~linearly
with N (each iteration is one map-only assignment pass + a K x dim-key
partial-combining aggregate) and the max/median task ratio stays ~1 —
per-task time is N/num_tasks (more executors = proportionally less per
task), and there is no per-group or per-cluster task in the plan to
concentrate work. An absolute max-task bound is the WRONG metric here
(unlike the mega-bucket probes): on a fixed 32-thread local box every
task legitimately carries N/32 rows.

Usage: python scripts/probe_kmeans_scale.py [rows ...]
       (default: 1_000_000 4_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from opay_datalake_script_spark.llmdata.similarity import kmeans_fit  # noqa: E402
from scripts.probe_megagroup import _rest, completed_stage_ids  # noqa: E402


def task_skew(ui: str, app_id: str, skip: set) -> tuple[float, float]:
    """(max_task_s, max/median ratio) of the heaviest completed stage
    outside `skip` — skew ~1 means no task carries more than its share."""
    worst, ratio = 0.0, 1.0
    for sid, att in completed_stage_ids(ui, app_id) - skip:
        try:
            summ = _rest(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}"
                "/taskSummary?quantiles=0.5,1.0"
            )
            mx = summ["executorRunTime"][-1] / 1000.0
            med = max(summ["executorRunTime"][0] / 1000.0, 1e-9)
            if mx > worst:
                worst, ratio = mx, mx / med
        except Exception:
            continue
    return worst, ratio


def synth(spark, rows: int):
    """(vec_id, v): 64 hash-derived doubles in [-0.5, 0.5) per row."""
    return spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.hash(F.col("id") * 64 + i), F.lit(1000)).cast("double")
                / 1000.0
                - 0.5
            ),
        ).alias("v"),
    )


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

    assigned, _ = kmeans_fit(synth(spark, 5000), k=8, iters=3)  # warmup
    assigned.groupBy("cluster").count().collect()

    for rows in sizes:
        seen = completed_stage_ids(ui, app_id)
        t0 = time.time()
        assigned, cents = kmeans_fit(synth(spark, rows), k=8, iters=3)
        hist = {r["cluster"]: r["n"] for r in
                assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
        mx, ratio = task_skew(ui, app_id, seen)
        print(json.dumps({
            "rows": rows,
            "wall_s": round(time.time() - t0, 2),
            "clusters": len(hist),
            "max_list": max(hist.values()),
            "max_task_s": round(mx, 2),
            "max_over_median": round(ratio, 2),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
