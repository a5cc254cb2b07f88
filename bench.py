"""Benchmark harness: runs the headline queries (BASELINE.md §2 set) on one
warm SparkSession and prints ONE JSON line with per-query medians.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opay_datalake_script_spark import get_spark
from opay_datalake_script_spark.registry import QUERIES, load_all_queries

BENCH_QUERIES = [
    "d_agg_basic",
    "c_join_multiway",
    "e_topk_per_group",
    "e_dedupe_latest",
    "h_json",
    "i_tumbling",
    "d_grouping_sets",
    "k_similarity_topk",
    "e_sessionize_batch",
    "k_exact_dedup",
]

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="opay-datalake-spark-bench", cpus=cpus)
    load_all_queries()
    names = [n for n in BENCH_QUERIES if n in QUERIES]

    # Warm the JVM/codegen once per query before timing (BASELINE.md timed
    # DuckDB warm; we mirror median-of-3 on a warm session).
    per_query: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
