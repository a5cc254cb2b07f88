"""Stage-level timing for k_near_dedup_lsh's sub-pipelines (guide §1):
each stage is materialized through the noop sink so the timing covers
every column of every row with no driver transfer.

Usage: python scripts/profile_lsh_stages.py [runs]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opay_datalake_script_spark import get_spark
from opay_datalake_script_spark.llmdata import dedup
from opay_datalake_script_spark.registry import QUERIES, load_all_queries
from opay_datalake_script_spark.sources.io import load


def noop_time(df, runs: int) -> tuple[float, float]:
    df.write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return statistics.median(times), min(times)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lsh-stage-profile")
    load_all_queries()
    sc = spark.sparkContext
    d = load(spark, sf_dir, "documents")

    stages = {
        "scan_only": d,
        "tokens_explode": d.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(dedup.normalized_text(), " "))
            ).alias("tok"),
        ),
        "minhash_sig": dedup.minhash_signatures(d),
        "banded_buckets": dedup._banded_buckets(d),
        "band_candidates": dedup.band_candidate_pairs(d),
        "full_query": QUERIES["k_near_dedup_lsh"](spark, sf_dir),
    }
    for name, df in stages.items():
        sc.setJobDescription(f"lsh-profile: {name}")
        med, lo = noop_time(df, runs)
        print(f"{name:20s} median={med:7.3f}s min={lo:7.3f}s")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
