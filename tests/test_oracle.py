"""Differential test: every oracle-checkable query ID vs DuckDB at sf0.01.

Mirrors the driver's correctness gate locally (SURVEY.md §5.2) so hash
mismatches surface before the driver runs. Rows-only query IDs get a
non-empty/shape smoke check instead.
"""

from __future__ import annotations

import pytest

from opay_datalake_script_spark.registry import ORACLES, QUERIES, load_all_queries

from .conftest import SF_DIR, assert_matches_oracle

load_all_queries()

ORACLE_IDS = sorted(ORACLES)
ROWS_ONLY_IDS = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_IDS)
def test_oracle_match(spark, oracle_con, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle_con, ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_IDS)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
