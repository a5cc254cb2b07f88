"""A/B the FRESH (build-inclusive) execution of the iterative/
multi-exchange ops under AQE coalescing variants — the bench-invisible
cost tracked by bench.py --build-inclusive (BASELINE §2g).

The candidate-generation exchanges are tiny at local SF (LSH signature
703 KiB, bucket sizes ~26 KiB), so with parallelismFirst=true AQE
coalesces them to ceil(bytes / minPartitionSize=1m) = 1 partition and
the star/chain pair explosion + partial distinct run on ONE task.
This probe measures fresh wall-clock per AQE-coalescing setting.

Usage: python scripts/probe_lsh_fresh.py [runs] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opay_datalake_script_spark import get_spark
from opay_datalake_script_spark.registry import QUERIES, load_all_queries

MIN_PS = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
MIN_PN = "spark.sql.adaptive.coalescePartitions.minPartitionNum"
COALESCE = "spark.sql.adaptive.coalescePartitions.enabled"

VARIANTS = [
    ("default(1m)", {}),
    ("minpn=8", {MIN_PN: "8"}),
    ("minpn=32", {MIN_PN: "32"}),
    ("minps=16k", {MIN_PS: "16k"}),
    ("coalesce=off", {COALESCE: "false"}),
]
DEFAULTS = {MIN_PS: "1m", MIN_PN: None, COALESCE: "true"}


def steal_ticks() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or ["k_near_dedup_lsh"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fresh-probe")
    load_all_queries()
    for name in names:
        for label, conf in VARIANTS:
            for k, v in DEFAULTS.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            for k, v in conf.items():
                spark.conf.set(k, v)
            times = []
            for i in range(runs):
                df = QUERIES[name](spark, sf_dir)  # fresh DF per run
                spark.sparkContext.setJobDescription(f"{name} {label} #{i}")
                s0, t0 = steal_ticks(), time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt, ds = time.perf_counter() - t0, steal_ticks() - s0
                times.append(dt)
                print(f"{name} {label:14s} run{i}: {dt:8.2f}s steal={ds}",
                      flush=True)
            print(f"{name} {label:14s} min={min(times):8.2f}s", flush=True)
    for k, v in DEFAULTS.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


if __name__ == "__main__":
    main()
