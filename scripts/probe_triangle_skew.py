"""Adversarial-skew probe for d_triangle_count's degree-ordered
orientation: a mega-hub star (one node adjacent to EVERY other) plus a
path through the leaves, so every leaf closes a triangle with the hub.

The naive node-iterator pairs ALL neighbors of every apex: the hub
alone emits C(W, 2) wedges — quadratic in hub degree, the shape that
melts on real co-purchase graphs (every basket shares the banner
product). Degree orientation points every hub edge TOWARD the hub
(the hub ranks last), so the hub's out-degree is ~0 and the wedge work
moves to the leaves (out-degree <= 3) — O(E) total on this graph,
bounded by sqrt(E) out-degree in general.

Two modes per width:
  oriented — the shipped triangle_participation pipeline.
  naive    — apex x all-neighbor-pairs wedge join, closed against the
             canonical edge list (counts each triangle 3x, once per
             apex; per-node counts are exactly 3x the oriented ones —
             asserted, which double-pins orientation correctness).

Correctness pins per run: hub participation = W-1, total participation
sum = 3*(W-1), leaf counts <= 2. Max-task seconds via the Spark UI
REST API, as in probe_megabucket.

Usage: python scripts/probe_triangle_skew.py
  (oriented at 10k / 100k / 1M hub width; naive only at 2k / 10k /
   20k — quadratic: 20k already emits 2e8 wedges.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from opay_datalake_script_spark.operators.aggregates import (  # noqa: E402
    triangle_participation,
)
from probe_megabucket import completed_stage_ids, max_task_seconds  # noqa: E402


def hub_graph(spark, width: int):
    """Distinct (u, v) edges, u < v: star 0-i for i in 1..width, plus
    the leaf path i-(i+1) — every leaf edge closes a hub triangle."""
    leaves = spark.range(1, width + 1)
    star = leaves.select(F.lit(0).cast("long").alias("u"), F.col("id").alias("v"))
    path = (
        spark.range(1, width)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    )
    return star.unionByName(path)


def naive_participation(pairs):
    """Unoriented node-iterator: every apex pairs ALL its neighbors.
    Each triangle closes at all 3 apexes -> per-node counts are 3x."""
    und = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    x, y = und.alias("x"), und.alias("y")
    cand = x.join(
        y, (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v"))
    ).select(
        F.col("x.u").alias("apex"),
        F.col("x.v").alias("b"),
        F.col("y.v").alias("c"),
    )
    closed = cand.join(
        pairs.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
    )
    return (
        closed.select(F.col("apex").alias("node"))
        .unionByName(closed.select(F.col("b").alias("node")))
        .unionByName(closed.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    assert ui, "Spark UI did not come up; the probe cannot measure tasks"
    app_id = spark.sparkContext.applicationId

    warm = hub_graph(spark, 2000)
    triangle_participation(warm).count()
    naive_participation(warm).count()

    runs = [
        ("oriented", 10_000),
        ("oriented", 100_000),
        ("oriented", 1_000_000),
        ("naive", 2_000),
        ("naive", 10_000),
        ("naive", 20_000),
    ]
    for mode, width in runs:
        pairs = hub_graph(spark, width)
        fn = triangle_participation if mode == "oriented" else naive_participation
        seen = completed_stage_ids(ui, app_id)
        t0 = time.time()
        rows = fn(pairs).collect()
        wall = round(time.time() - t0, 2)
        worst = max_task_seconds(ui, app_id, seen)
        scale = 1 if mode == "oriented" else 3
        got = {r["node"]: r["n_tri"] for r in rows}
        assert got[0] == scale * (width - 1), (mode, width, got[0])
        assert sum(got.values()) == scale * 3 * (width - 1)
        assert max(v for k, v in got.items() if k != 0) <= scale * 2
        print(
            json.dumps(
                {
                    "mode": mode,
                    "width": width,
                    "wall_s": wall,
                    "max_task_s": round(worst, 2),
                    "hub_n_tri": got[0],
                    "nodes_in_triangles": len(got),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
