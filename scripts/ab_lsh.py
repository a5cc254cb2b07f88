"""Quick A/B timing for the LSH family (bench methodology: toPandas).

Usage: python scripts/ab_lsh.py [runs] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opay_datalake_script_spark import get_spark
from opay_datalake_script_spark.registry import QUERIES, load_all_queries


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or ["k_minhash_signature", "k_near_dedup_lsh"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-lsh")
    load_all_queries()
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"ab: {name}")
        t0 = time.perf_counter()
        n = len(df.toPandas())  # warm
        warm = time.perf_counter() - t0
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.toPandas()
            times.append(time.perf_counter() - t0)
        print(
            f"{name:24s} rows={n:8d} warm={warm:7.3f}s "
            f"median={statistics.median(times):7.3f}s min={min(times):7.3f}s"
        )


if __name__ == "__main__":
    main()
