"""Full-registry physical-plan audit: build EVERY registered query and
grep its executed plan for the shapes that kill a 100x scale-up —
single-partition exchanges, cartesian products, non-broadcast
nested-loop joins, and windows with an EMPTY partition spec (the
t_q15 class: the whole input funnels through one task).

Run: python scripts/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
Writes PLAN_AUDIT.json at the repo root and prints a summary table of
every op that trips a detector, with the matching plan lines.

Known-benign shapes it distinguishes rather than flags blindly:
* Exchange SinglePartition directly under a partial aggregate whose
  output is one row per upstream partition (global agg(max/sum/count))
  — moves O(partitions) rows, fine at any scale; counted separately.
* BroadcastNestedLoopJoin used for a 1-row scalar broadcast cross join
  (the Q11/Q15 global-total pattern) — counted separately from a
  nested-loop join between two real tables.
Every op that still shows a FLAGGED shape must either be fixed or carry
a docstring justifying why its input at that point is corpus-sublinear
(e.g. a month-grain rollup) — NOTES_r06 records the adjudication.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from opay_datalake_script_spark import get_spark  # noqa: E402
from opay_datalake_script_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)

# Ops whose build step runs streaming jobs / landings — still audited
# (the returned DataFrame is the re-read), but their build cost is IO,
# not plan construction, so they get a longer mental budget.
_WINDOW_RE = re.compile(r"^\s*(?:[+:*\-|\s]*)Window (\[.*)$")


def _top_level_groups(rest: str) -> list[str]:
    """Split a plan line's tail into its top-level [...] bracket groups."""
    groups: list[str] = []
    depth = 0
    buf: list[str] = []
    for ch in rest:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def _empty_partition_windows(plan: str) -> list[str]:
    """Window operator lines whose PARTITION spec is empty — the shape
    WindowExec warns about ("No Partition Defined ... moving all data
    to a single partition").

    Plan text renders as ``Window [exprs], [partition], [order]``, but
    empty specs are simply omitted, so the group count alone is
    ambiguous: 2 groups is EITHER partitioned-unordered (benign, e.g.
    count(*) over (partition by k)) OR unpartitioned-ordered (the bad
    one). Disambiguate by the sort markers — an order spec's entries
    always carry ASC/DESC.
    """
    hits = []
    for line in plan.splitlines():
        m = _WINDOW_RE.match(line)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) >= 3:
            continue  # [exprs], [partition], [order] — partitioned
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # [exprs], [partition] — partitioned, no order
        # The distributed two-phase prefix-sum's OFFSETS window runs
        # unpartitioned BY DESIGN over the per-partition count table —
        # O(num_partitions) rows, never corpus-linear. Its signature is
        # ordering on the synthetic _pid column; classify separately so
        # real global windows stand out.
        if "windowspecdefinition(_pid#" in line:
            continue
        hits.append(line.strip()[:200])
    return hits


def _single_partition_lines(plan: str) -> list[str]:
    return [
        ln.strip()[:200]
        for ln in plan.splitlines()
        if "Exchange SinglePartition" in ln
    ]


def audit_one(spark, name: str, fn, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    build_s = round(time.perf_counter() - t0, 2)
    return {
        "build_s": build_s,
        "n_exchange": plan.count("Exchange "),
        "single_partition": _single_partition_lines(plan),
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "empty_partition_windows": _empty_partition_windows(plan),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit", cpus="32")
    queries = load_all_queries()
    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(queries.items()):
        try:
            out[name] = audit_one(spark, name, fn, sf_dir)
        except Exception:
            errors[name] = traceback.format_exc(limit=2)
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(queries)}", file=sys.stderr)

    flagged = {
        n: r
        for n, r in out.items()
        if r["cartesian"]
        or r["empty_partition_windows"]
        or r["single_partition"]
        or r["bnlj"]
    }
    with open(os.path.join(ROOT, "PLAN_AUDIT.json"), "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "results": out, "errors": errors}, fh, indent=1
        )
    print(f"audited {len(out)} ops, {len(errors)} errors, "
          f"{len(flagged)} with shapes needing adjudication")
    for n, r in sorted(flagged.items()):
        marks = []
        if r["cartesian"]:
            marks.append(f"CARTESIAN x{r['cartesian']}")
        if r["empty_partition_windows"]:
            marks.append(f"EMPTY-PART WINDOW x{len(r['empty_partition_windows'])}")
        if r["single_partition"]:
            marks.append(f"SinglePartition x{len(r['single_partition'])}")
        if r["bnlj"]:
            marks.append(f"BNLJ x{r['bnlj']}")
        print(f"  {n}: {', '.join(marks)}")
    for n in errors:
        print(f"  ERROR {n}")


if __name__ == "__main__":
    main()
