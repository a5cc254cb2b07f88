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
# A recheck is SATISFIED once the entry has a non-failed driver row at
# round >= its proof round; satisfied entries fall back to the stale-
# refresh tier instead of crowding the window again next round (round-8
# lesson: the 13 round-7 re-proofs, all green in CORRECTNESS_r07, were
# still sorting into tier 1 and would have displaced 7 of the 8 spilled
# first-rows).
_RECHECK_PROOF_ROUND = 8
_RECHECK = (
    # round-8 changes (all 13 round-7 entries got green r7 rows and are
    # cleared). The salted-chain densification of capped LSH buckets
    # (VERDICT r7 item 7): band_candidate_pairs and the shared banding
    # oracle CTE both add LSH_CHAIN_SALTS deterministic chains to
    # oversized (band, bucket) groups; these four flagship consumers
    # changed code+oracle and get re-proof per the r7 precedent (results
    # at the oracle SF are unchanged — no oversized buckets — so the
    # other consumers' green rows stay valid evidence; sf0.1 candidate
    # parity was verified cross-engine bit-for-bit this round).
    "k_jaccard_pairs",
    "k_near_dedup_lsh",
    "k_lsh_band_candidates",
    "k_ngram_jaccard",
    # image-side twin of the chain change (code+oracle, same round)
    "k_image_ahash_dedup",
)

# New IDs registered THIS round whose first driver row is deliberately
# deferred behind the 44 older never-checked IDs (VERDICT r6 item 7:
# "defer to r8 rather than displace first-rows"). They order after
# every plain never-checked entry but before the stale-evidence tier.
_DEFER_FIRST_ROW = frozenset({"k_ann_grid"})

# The round-7 display-exactness wave: every remaining query whose
# rounded money/quantity display either summed raw doubles or rounded
# a DOUBLE quotient was converted to the shared exact scheme
# (functions/exact.py). All are locally hash-verified on the new code;
# their driver re-proof is DEFERRED one round so the round-7 window
# still drains the never-checked backlog (VERDICT r6 item 1 outranks).
# Self-activating: while a COMPLETE (>= 50-row) CORRECTNESS file for
# round >= _RECHECK_NEXT_AFTER_ROUND does not exist (i.e. during the
# round-7 driver run, even a crashed-and-resumed one that left a
# partial file) these sort AFTER all never-checked entries; once it
# lands (round 8), they sort directly after _RECHECK — 36 re-proofs +
# the 8 spilled first-rows fit round 8's 50-slot window with 6 slots
# to spare.
_RECHECK_NEXT_AFTER_ROUND = 7
_RECHECK_NEXT_PROOF_ROUND = 8
_RECHECK_NEXT = (
    "d_agg_basic",
    "d_agg_filtered_pivot",
    "d_grouping_sets",
    "d_cube",
    "d_rollup",
    "c_join_multiway",
    "c_join_skew_salted",
    "c_join_bucketed",
    "t_q01_pricing_summary",
    "t_q08_market_share",
    "t_q09_product_profit",
    "t_q11_important_share",
    "t_q14_promo_effect",
    "t_q15_top_supplier",
    "i_tumbling",
    "i_sliding",
    "i_session",
    "i_stateful_counter",
    "e_rolling_rows",
    "e_cumulative",
    "e_gap_fill_forward",
    "e_rolling_median",
    "s_hiveql_mapjoin_report",
    "s_hiveql_multi_insert",
    "s_hiveql_grouping_id",
    "r_ads_daily_report",
    "r_incremental_daily_agg",
    "r_mom_yoy_report",
    "r_dq_anomaly_zscore",
    "r_rfm_segments",
    "r_user_trend_slope",
    "r_ltv_cohort",
    "r_ab_test_lift",
    "h_geo_grid_heatmap",
    "j_ewma_grouped",
    "j_grouped_agg",
)


def _driver_history() -> tuple[dict[str, tuple[int, dict]], int]:
    """(latest (round, row) per query ID, max COMPLETE round) across all
    CORRECTNESS_r*.json. A partial file from a crashed-and-resumed run
    must not activate the deferred-recheck wave mid-round (it would
    displace the first-rows it exists to protect). Completeness is
    DERIVED, not hardcoded (ADVICE r7): any round older than the newest
    file is final by construction (the driver never appends to a past
    round), and the newest file is complete once it reaches the MOST
    RECENT finished round's window size (fallback 50 when no history
    exists) — so a future driver window smaller than 50 cannot
    permanently block wave activation, while one historically small or
    crash-abandoned round cannot poison the bar for every later round
    (r8 review: an all-time minimum would let a genuinely partial
    newest file count as complete forever after)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, dict]] = {}
    sizes: dict[int, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        sizes[rnd] = len(rows)
        for name, row in rows.items():
            latest[name] = (rnd, row)
    max_complete = 0
    if sizes:
        max_rnd = max(sizes)
        finished = [r for r in sizes if r < max_rnd]
        if finished:
            max_complete = max(finished)
        threshold = sizes[max(finished)] if finished else 50
        if sizes[max_rnd] >= threshold:
            max_complete = max_rnd
    return latest, max_complete


def _reorder(mapping: dict) -> dict:
    """Order the registry so the driver's ~50-entry window lands on the
    queries whose evidence is most in need of (re)freshening."""
    history, max_complete_round = _driver_history()
    reg_pos = {n: i for i, n in enumerate(mapping)}
    next_wave_active = max_complete_round >= _RECHECK_NEXT_AFTER_ROUND

    def key(name: str):
        hit = history.get(name)
        if hit is not None:
            rnd, row = hit
            # A row counts as FAILED when a comparison explicitly
            # mismatched (an explicit False is a failure no matter what
            # err says — even 'no_oracle' must not mask it), or when a
            # non-benign harness exception (truthy err) prevented the
            # VALUE-hash check from passing — rows_match alone is not
            # enough, since an exception between the row-count check
            # and the hash comparison leaves an unverified value hash.
            # Benign markers ('no_oracle' today; any future marker
            # accompanying a full hash pass) must not promote green
            # queries to tier 0 and crowd the ~50-slot window
            # (ADVICE r6 + r7 review).
            failed = (
                row.get("rows_match") is False
                or row.get("hash_match") is False
                or (
                    bool(row.get("err"))
                    and row.get("err") != "no_oracle"
                    and row.get("hash_match") is not True
                )
            )
            if failed:
                return (0, 0, reg_pos[name])
        # A recheck entry whose re-proof already LANDED (non-failed
        # driver row at round >= its proof round) must not keep its
        # tier-1 slot — it would crowd the next window and displace the
        # first-rows behind it (observed round 8: the 13 green r7
        # re-proofs left room for only 1 of the 8 spilled first-rows).
        if name in _RECHECK and (hit is None or hit[0] < _RECHECK_PROOF_ROUND):
            return (1, 0, reg_pos[name])
        if name in _RECHECK_NEXT and (
            hit is None or hit[0] < _RECHECK_NEXT_PROOF_ROUND
        ):
            # deferred re-proof wave: behind current rechecks once its
            # round arrives, behind all first-rows until then
            if next_wave_active:
                return (1, 1, reg_pos[name])
            return (2, 2, reg_pos[name])
        if hit is None:
            return (2, 1 if name in _DEFER_FIRST_ROW else 0, reg_pos[name])
        return (3, hit[0], reg_pos[name])

    return {n: mapping[n] for n in sorted(mapping, key=key)}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under a §2 query ID.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent; omit it for
    ops that are not SQL-expressible (the driver then records a weaker
    rows-only check).

    Duplicate IDs raise: last-wins silently dropped an operator out of
    the registry for a full round (`c_join_interval_overlap` shadowed
    its round-7 predecessor, caught only by review in round 8 — the
    exact failure mode the round-5 verify note warned about). A
    re-registration of the SAME function object stays idempotent so
    module re-execution (e.g. importlib.reload in a debug session)
    doesn't false-positive.
    """

    def deco(fn: QueryFn) -> QueryFn:
        prev = QUERIES.get(name)
        if prev is not None and (
            prev.__module__ != fn.__module__ or prev.__qualname__ != fn.__qualname__
        ):
            raise ValueError(
                f"duplicate registry ID {name!r}: already registered by "
                f"{prev.__module__}.{prev.__qualname__}, now redefined by "
                f"{fn.__module__}.{fn.__qualname__} — pick a distinct ID "
                "(last-wins shadowing silently drops the first operator)"
            )
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
