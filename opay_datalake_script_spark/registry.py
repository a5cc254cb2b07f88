"""Query registry: maps SURVEY.md §2 query IDs to builder functions and
(for the oracle-checkable ones) to equivalent ANSI SQL for DuckDB.

The reference's unit of computation was one Airflow task rendering one
HiveQL script (SURVEY.md §3.1); ours is one pure function
``(spark, sf_dir) -> DataFrame`` registered here. Idempotent by
construction — the lesson adopted from the reference's rerun-safe
``INSERT OVERWRITE`` discipline (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "opay_datalake_script_spark.sources.io",
    "opay_datalake_script_spark.operators.relational",
    "opay_datalake_script_spark.operators.joins",
    "opay_datalake_script_spark.operators.aggregates",
    "opay_datalake_script_spark.operators.windows",
    "opay_datalake_script_spark.operators.reports",
    "opay_datalake_script_spark.operators.tpch",
    "opay_datalake_script_spark.operators.hiveql",
    "opay_datalake_script_spark.functions.scalar",
    "opay_datalake_script_spark.functions.udfs",
    "opay_datalake_script_spark.streaming.jobs",
    "opay_datalake_script_spark.llmdata.dedup",
    "opay_datalake_script_spark.llmdata.similarity",
    "opay_datalake_script_spark.llmdata.textstats",
    "opay_datalake_script_spark.llmdata.multimodal",
    "opay_datalake_script_spark.llmdata.sampling",
    "opay_datalake_script_spark.llmdata.pipeline",
)

# The driver's per-round correctness run verifies only the first ~50
# registry entries, so registration order decides which queries get
# driver-verified evidence. Derive the order from the CORRECTNESS_r*
# files the driver leaves in the repo root (a hand-maintained snapshot
# went stale by round 2 — see ADVICE.md):
#   1. queries whose LATEST driver row FAILED (they carry fixes that
#      need re-proof),
#   2. queries listed in _RECHECK (code or oracle changed this round) —
#      changed code needs re-proof MORE than new code needs first proof
#      (round-5 lesson: its changed queries lost every window slot to
#      earlier-registered never-checked IDs and went un-reproven),
#   3. queries with no driver row at all, registration order,
#   4. everything else, stalest driver evidence first (ascending round
#      of the latest row) — older rows were taken against older fixture
#      generations (the events.ts encoding changed between rounds), so
#      refreshing the oldest evidence first keeps the whole registry
#      anchored to current fixtures,
# with registration order as the tiebreaker within each tier.
_RECHECK = (
    # round-5 changes that missed the round-5 driver window and still
    # await re-proof on the changed code: banded candidates -> exact
    # verify rewires (k_jaccard_pairs/k_ngram_jaccard scale-safety,
    # k_near_dedup_lsh rows-only -> oracle upgrade), survivor-set LSH
    # in the corpus pipeline, size-aware IVF probing, raise-on-non-
    # convergence components, decimal(20,0) e4 accumulators in Q1/Q8/Q14
    "k_jaccard_pairs",
    "k_ngram_jaccard",
    "k_near_dedup_lsh",
    "k_corpus_dedup_pipeline",
    "k_ann_ivf",
    "k_ann_ivf_stats",
    "k_dedup_components",
    "t_q01_pricing_summary",
    "t_q08_market_share",
    "t_q14_promo_effect",
    "i_tumbling",
    # round-6 changes: Q15 global max moved from an empty-partition
    # window to a 1-row broadcast; ADVICE.md fixes (floor-division
    # semantics, exact z-order bucket math, KMV exact_distinct)
    "t_q15_top_supplier",
    "a_zorder_clustered_write",
    "d_kmv_distinct_sketch",
    "r_attribution_linear",
    "d_bitmap_audience_overlap",
)


def _driver_history() -> dict[str, tuple[int, dict]]:
    """Latest (round, row) per query ID across all CORRECTNESS_r*.json."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            latest[name] = (rnd, row)
    return latest


def _reorder(mapping: dict) -> dict:
    """Order the registry so the driver's ~50-entry window lands on the
    queries whose evidence is most in need of (re)freshening."""
    history = _driver_history()
    reg_pos = {n: i for i, n in enumerate(mapping)}

    def key(name: str):
        hit = history.get(name)
        if hit is not None:
            rnd, row = hit
            failed = (
                row.get("rows_match") is False
                or row.get("hash_match") is False
                # a harness exception (err set, matches null) is a
                # failure too — 'no_oracle' is the one benign err the
                # driver records for rows-only-by-design queries
                or row.get("err") not in (None, "no_oracle")
            )
            if failed:
                return (0, 0, reg_pos[name])
        if name in _RECHECK:
            return (1, 0, reg_pos[name])
        if hit is None:
            return (2, 0, reg_pos[name])
        return (3, hit[0], reg_pos[name])

    return {n: mapping[n] for n in sorted(mapping, key=key)}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under a §2 query ID.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent; omit it for
    ops that are not SQL-expressible (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> dict[str, QueryFn]:
    """Import every query module (idempotent) and return the registry,
    ordered so driver-unverified queries come first (see _PRIORITY)."""
    for mod in _QUERY_MODULES:
        import_module(mod)
    return _reorder(QUERIES)
