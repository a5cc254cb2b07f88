"""Pins for the sources/streaming scratch-and-staging machinery: fixture
staging freshness, footer-sniff cache invalidation, run-dir rotation,
stale-partition hygiene, and multi-batch-safe foreachBatch landing —
the failure modes are all masked at fixture scale (single-file staging
collapses every stream into one micro-batch; all three scale factors
span identical date ranges), so each mechanism is pinned directly.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from opay_datalake_script_spark.registry import QUERIES, load_all_queries
from opay_datalake_script_spark.sources import io as src_io
from opay_datalake_script_spark.streaming import jobs

from .conftest import SF_DIR

load_all_queries()


def _write_events_parquet(path: str, ids: list[int]) -> None:
    pq.write_table(
        pa.table({"event_id": pa.array(ids, pa.int64())}), path
    )


def test_stage_stream_dir_restages_on_equal_size_older_mtime(tmp_path):
    """The stamp check must be EXACT equality, not size-or-newer-mtime: a
    fixture restored with preserved (older) timestamps and coincidentally
    equal size is still a different fixture and must be re-staged."""
    fix = tmp_path / "sfX"
    fix.mkdir()
    f = str(fix / "events.parquet")
    _write_events_parquet(f, [1, 2, 3])
    d1 = src_io.stage_stream_dir(str(fix), "events")
    staged = os.path.join(d1, "events.parquet")
    first = open(staged, "rb").read()

    # Regenerate with identical size (same schema/row count, different
    # values) and force the mtime OLDER than the staged copy's.
    _write_events_parquet(f, [7, 8, 9])
    old = time.time() - 3600
    os.utime(f, (old, old))
    assert os.path.getsize(f) == len(first) or True  # size may match; stamp must not
    src_io.stage_stream_dir(str(fix), "events")
    second = open(staged, "rb").read()
    assert second != first, "stale staged copy survived a fixture regeneration"
    assert pq.read_table(staged).column("event_id").to_pylist() == [7, 8, 9]


def test_nano_sniff_cache_keys_on_file_stat(tmp_path):
    """_nano_cols caches per (file, size, mtime_ns): re-encoding the same
    path from us to ns timestamps must re-sniff, not reuse the stale
    cached verdict (which would silently misread every timestamp)."""
    f = str(tmp_path / "events.parquet")
    ts_us = pa.array([1_700_000_000_000_000], pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts_us}), f)
    assert src_io._nano_cols(f, "events") == ()
    ts_ns = pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))
    pq.write_table(
        pa.table({"ts": ts_ns}), f, store_schema=False, coerce_timestamps=None
    )
    assert src_io._nano_cols(f, "events") == ("ts",), (
        "stale sniff cache survived a re-encode of the same path"
    )


def test_rotate_scratch_runs_keeps_newest_and_ignores_other_prefixes(tmp_path):
    base = str(tmp_path)
    for i in range(6):
        d = os.path.join(base, f"run_{i}")
        os.makedirs(d)
        t = time.time() - (100 - i)  # run_5 newest
        os.utime(d, (t, t))
    os.makedirs(os.path.join(base, "src_shared"))
    src_io.rotate_scratch_runs(base, keep=4)
    left = sorted(os.listdir(base))
    assert left == ["run_2", "run_3", "run_4", "run_5", "src_shared"], left


def test_rotate_scratch_runs_tolerates_concurrent_deletion(tmp_path, monkeypatch):
    """A sibling rotation deleting an entry between the glob and the
    mtime stat must not raise (ADVICE r8): the vanished entry sorts as
    oldest and its rmtree is an idempotent no-op."""
    base = str(tmp_path)
    for i in range(6):
        d = os.path.join(base, f"run_{i}")
        os.makedirs(d)
        t = time.time() - (100 - i)
        os.utime(d, (t, t))
    real_getmtime = os.path.getmtime
    import shutil

    def racy_getmtime(p):
        if p.endswith("run_0"):  # vanishes mid-scan
            shutil.rmtree(p, ignore_errors=True)
            raise FileNotFoundError(p)
        return real_getmtime(p)

    monkeypatch.setattr(src_io.os.path, "getmtime", racy_getmtime)
    src_io.rotate_scratch_runs(base, keep=4)
    left = sorted(os.listdir(base))
    assert left == ["run_2", "run_3", "run_4", "run_5"], left


def test_rotate_scratch_runs_excludes_unstatable_entries(tmp_path, monkeypatch):
    """A stat failure OTHER than a vanished entry (EACCES/EIO — possibly
    a LIVE run dir behind a transient error) excludes the entry from the
    pass entirely: never deleted, and not counted against ``keep``
    either — ``keep`` persistently unstat-able leftovers squatting the
    newest slots would otherwise push a genuinely fresh in-flight run
    dir past the cutoff (ADVICE r9 + r10 review). Rotation among the
    statable entries still proceeds normally."""
    base = str(tmp_path)
    for i in range(6):
        d = os.path.join(base, f"run_{i}")
        os.makedirs(d)
        t = time.time() - (100 - i)  # run_5 newest
        os.utime(d, (t, t))
    real_getmtime = os.path.getmtime

    def flaky_getmtime(p):
        if p.endswith(("run_0", "run_1")):
            raise PermissionError(13, "denied", p)
        return real_getmtime(p)

    monkeypatch.setattr(src_io.os.path, "getmtime", flaky_getmtime)
    src_io.rotate_scratch_runs(base, keep=2)
    left = sorted(os.listdir(base))
    # run_0/run_1: excluded, untouched. Statable run_2..run_5: the two
    # newest (run_4, run_5) fill keep=2; run_2/run_3 rotate away.
    assert left == ["run_0", "run_1", "run_4", "run_5"], left


def test_day_epoch_write_multi_batch_and_replay(spark, tmp_path):
    """The i_foreach_batch_sink landing mechanism, exercised directly:
    two micro-batches carrying rows for the SAME day must both survive
    (a dt-only dynamic overwrite would drop batch 0's day-D rows when
    batch 1 lands), and an at-least-once replay of a batch must replace
    its own slice, not append a duplicate."""
    import datetime as dt

    out = str(tmp_path / "by_day")
    schema = "event_id long, ts timestamp, v long"
    day = dt.datetime(2024, 3, 1, 10, 0, 0)
    b0 = spark.createDataFrame([(1, day, 10), (2, day, 20)], schema)
    b1 = spark.createDataFrame([(3, day, 30)], schema)
    jobs.write_day_epoch_partition(b0, 0, out)
    jobs.write_day_epoch_partition(b1, 1, out)  # same day, later batch
    jobs.write_day_epoch_partition(b0, 0, out)  # replay of batch 0
    back = spark.read.parquet(out)
    assert sorted(r["event_id"] for r in back.collect()) == [1, 2, 3]
    assert back.select("dt").distinct().count() == 1


def test_foreach_batch_sink_lands_full_source_per_day(spark):
    got = QUERIES["i_foreach_batch_sink"](spark, SF_DIR)
    src = src_io.load(spark, SF_DIR, "events")
    assert got.count() == src.count()
    # Landing is run-fresh and rotated: at most keep+1 run dirs remain.
    base = os.path.join(
        src_io.SCRATCH_DIR, "foreach_batch", src_io.fixture_tag(SF_DIR)
    )
    runs = [d for d in os.listdir(base) if d.startswith("run_")]
    assert 1 <= len(runs) <= 5, runs


def test_stream_file_source_concurrent_invocations(spark):
    """Two concurrent invocations must not collide on the memory-sink
    query name (a fixed name raises 'query with that name is already
    active' on the second start)."""
    from concurrent.futures import ThreadPoolExecutor

    src_io.stage_stream_dir(SF_DIR, "events")  # pre-warm staging once
    want = src_io.load(spark, SF_DIR, "events").count()

    def run(_):
        return QUERIES["a_stream_file_source"](spark, SF_DIR).count()

    with ThreadPoolExecutor(max_workers=2) as ex:
        counts = list(ex.map(run, range(2)))
    assert counts == [want, want]


def test_sink_partitioned_wipes_stale_foreign_partition(spark):
    """The initial full reload must be a STATIC overwrite: under the
    session's dynamic default, a partition present in a previous fixture
    generation but absent from the current one would survive the reload
    and leak into the re-read."""
    out = os.path.join(
        src_io.SCRATCH_DIR, "sink_partitioned", f"orders_{src_io.fixture_tag(SF_DIR)}"
    )
    stale = os.path.join(out, "dt=1900-01")
    os.makedirs(stale, exist_ok=True)
    spark.range(3).select(F.col("id").alias("o_orderkey")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stale)
    got = QUERIES["a_sink_partitioned"](spark, SF_DIR)
    assert got.where(F.col("dt") == "1900-01").count() == 0
    assert not os.path.exists(stale), "static reload must truncate stale partitions"


def test_pyds_sink_leaves_no_tmp_files(spark):
    QUERIES["a_python_datasource_sink"](spark, SF_DIR).collect()
    out_dir = os.path.join(
        src_io.SCRATCH_DIR, "pyds_sink", f"orders_{src_io.fixture_tag(SF_DIR)}"
    )
    leftovers = [f for f in os.listdir(out_dir) if f.endswith(".tmp")]
    assert leftovers == []
