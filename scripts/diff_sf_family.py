#!/usr/bin/env python
"""Generic one-off sf-differential for a named family of registry IDs
(generalizes scripts/diff_sf01_banding.py — VERDICT r12 item 3 wants
the deterministic-ML family run at sf0.1, and future rounds will want
other families). Runs each ID's Spark query vs its DuckDB oracle at the
given fixture dir with the same comparator pytest uses (driver-parity
hash semantics) and prints one line per ID.

Usage: python scripts/diff_sf_family.py [--sf SF_DIR] ID [ID ...]
       python scripts/diff_sf_family.py --family ml   # built-in lists

Built-in families:
  ml      the r11 deterministic-ML conversions (Lloyd fit et al.) —
          never previously run against DuckDB at sf0.1's 2,000x64-d
          embeddings (verified at sf0.01/sf0.001 only)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

from conftest import assert_matches_oracle  # noqa: E402
from opay_datalake_script_spark import get_spark  # noqa: E402
from opay_datalake_script_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)
from opay_datalake_script_spark.schemas import TABLES  # noqa: E402

FAMILIES = {
    "ml": [
        "k_kmeans_clusters",
        "k_semdedup",
        "k_ann_ivf",
        "k_ann_ivf_stats",
        "k_centroid_per_label",
    ],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--family", choices=sorted(FAMILIES) + ["all"],
        help="'all' = every registered ID with an oracle, registry order",
    )
    ap.add_argument("--start", type=int, default=0,
                    help="slice start into the --family all list (tranches)")
    ap.add_argument("--stop", type=int, default=None)
    ap.add_argument("ids", nargs="*")
    args = ap.parse_args()
    ordered = load_all_queries()
    ids = list(args.ids)
    if args.family == "all":
        ids = [n for n in ordered if n in ORACLES][args.start:args.stop] + ids
    elif args.family:
        ids = FAMILIES[args.family] + ids
    if not ids:
        ap.error("no IDs given (use --family or positional IDs)")

    spark = get_spark(app_name="diff-sf-family")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    failures = 0
    for name in ids:
        sql = ORACLES.get(name)
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, args.sf)
            assert_matches_oracle(df, con, sql, name=name)
            n = df.count()
            print(f"{name}: HASH-OK {n} rows ({time.perf_counter() - t0:.1f} s)")
        except AssertionError as exc:
            failures += 1
            print(f"{name}: FAIL {str(exc)[:300]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
