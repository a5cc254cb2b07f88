#!/usr/bin/env python
"""One-off sf0.1 adversarial differential for the r11 banding-conversion
wave (VERDICT r11 item 7). The r11 rechecks verified the
capped_bucket_pairs rewrite at sf0.01/sf0.001; sf0.1's 3921-wide bucket
is the one fixture that exercises the star+chunked-chain path above the
chunk/cap knobs. Runs each family ID's Spark query vs its DuckDB oracle
at sf0.1 with the same comparator pytest uses (driver-parity hash
semantics) and prints one line per ID.

Usage: python scripts/diff_sf01_banding.py [sf_dir]
"""

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

# The 11 banding-family rechecks from the r11 wave plus the new
# two-source corpus pipeline that rides the same helper.
FAMILY = [
    "k_jaccard_pairs",
    "k_near_dedup_lsh",
    "k_lsh_band_candidates",
    "k_ngram_jaccard",
    "k_containment_dedup",
    "k_minhash_jaccard_estimate",
    "k_edit_distance_pairs",
    "k_winnow_candidates",
    "k_image_ahash_dedup",
    "k_incremental_dedup",
    "k_corpus_build_pipeline",
    "k_corpus_dedup_winnow",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="diff-sf01-banding")
    load_all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in FAMILY:
        sql = ORACLES.get(name)
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
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
