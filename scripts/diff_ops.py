"""Differential-check named registry ops against their DuckDB oracles.

Usage: python scripts/diff_ops.py <sf_dir> <op> [op ...]

Mirrors the driver's comparison (row count + column names + order-
insensitive normalized values) via the same logic tests/conftest.py
uses, but standalone — for verifying a code change's affected-op set
without waiting on the full parametrized sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from opay_datalake_script_spark import get_spark
from opay_datalake_script_spark.registry import ORACLES, QUERIES, load_all_queries
from opay_datalake_script_spark.schemas import TABLES


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    os.environ["SPARK_GRAFT_TEST_SF_DIR"] = sf_dir
    import conftest  # reuses normalized_rows/_norm_cell against sf_dir

    conftest.SF_DIR = sf_dir
    spark = get_spark(app_name="diff-ops")
    load_all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = []
    for name in names:
        if name not in ORACLES:
            print(f"{name}: NO ORACLE (skipped)")
            continue
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            # row count comes back from the comparison itself — a second
            # df.count() would re-execute the whole query (ADVICE r13)
            n = conftest.assert_matches_oracle(df, con, ORACLES[name], name)
            print(f"{name}: HASH-OK {n} rows ({time.perf_counter()-t0:.1f}s)")
        except Exception as ex:
            failed.append(name)
            print(f"{name}: FAIL {str(ex)[:300]}")
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
