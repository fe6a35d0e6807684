"""North-rule correctness gate: final-state token-array equality vs the
single-threaded replay oracle, after (a) full replay and (b) kill +
resume-from-checkpoint; exactly-once under epoch replay."""

import os
import shutil

import pytest

from tickers_daily_intraday_etl_spark.cdc.feedgen import generate_feed, write_feed_segments
from tickers_daily_intraday_etl_spark.cdc.merge import merge_into
from tickers_daily_intraday_etl_spark.cdc.oracle import final_state_frame
from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA_V2
from tickers_daily_intraday_etl_spark.streaming import CdcPipeline


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    events = generate_feed(n_events=2000, n_docs=150, seed=11, evolve_at=0.5)
    write_feed_segments(events, str(d), n_segments=6)
    return str(d), events


def _final_tokens(table):
    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    return {
        r["doc_id"]: (None if r["tokens"] is None else list(r["tokens"]))
        for _, r in pdf.iterrows()
    }


def _oracle_tokens(events):
    oracle = final_state_frame(events)
    return {
        r["doc_id"]: (None if r["tokens"] is None else list(r["tokens"]))
        for _, r in oracle.iterrows()
    }


def test_full_replay_matches_oracle(spark, feed, tmpdir_path):
    feed_dir, events = feed
    pipe = CdcPipeline(
        spark, feed_dir, os.path.join(tmpdir_path, "t"), os.path.join(tmpdir_path, "c"),
        feed_schema=CDC_SCHEMA_V2, num_buckets=8, max_files_per_trigger=2,
    )
    lineage = pipe.run_available_now()
    assert len(lineage) == 3  # 6 segments / 2 per trigger
    assert _final_tokens(pipe.table) == _oracle_tokens(events)


def test_kill_resume_matches_oracle(spark, feed, tmpdir_path):
    feed_dir, events = feed
    staged = os.path.join(tmpdir_path, "staged")
    held = os.path.join(tmpdir_path, "held")
    os.makedirs(staged), os.makedirs(held)
    segs = sorted(os.listdir(feed_dir))
    for s in segs[:3]:
        shutil.copy(os.path.join(feed_dir, s), staged)
    for s in segs[3:]:
        shutil.copy(os.path.join(feed_dir, s), held)

    t, c = os.path.join(tmpdir_path, "t"), os.path.join(tmpdir_path, "c")
    pipe1 = CdcPipeline(spark, staged, t, c, feed_schema=CDC_SCHEMA_V2, num_buckets=8)
    pipe1.run_available_now()
    # "kill": drop the pipeline; deliver the rest; resume on same checkpoint
    for s in segs[3:]:
        shutil.move(os.path.join(held, s), staged)
    pipe2 = CdcPipeline(spark, staged, t, c, feed_schema=CDC_SCHEMA_V2, num_buckets=8)
    lin2 = pipe2.run_available_now()
    assert all(not m["skipped"] for m in lin2)
    assert _final_tokens(pipe2.table) == _oracle_tokens(events)


def test_resumed_run_skips_committed_epochs(spark, feed, tmpdir_path):
    """Simulate foreachBatch retry after a crash *between* data commit and
    checkpoint write: Spark re-delivers the same batch_id; the fence holds."""
    feed_dir, events = feed
    t, c = os.path.join(tmpdir_path, "t"), os.path.join(tmpdir_path, "c")
    pipe = CdcPipeline(spark, feed_dir, t, c, feed_schema=CDC_SCHEMA_V2, num_buckets=8)
    pipe.run_available_now()
    v = pipe.table.log.latest_version()
    seg0 = spark.read.schema(CDC_SCHEMA_V2).parquet(os.path.join(feed_dir, sorted(os.listdir(feed_dir))[0]))
    m = merge_into(pipe.table, seg0, batch_id=0)  # re-delivery of epoch 0
    assert m["skipped"] is True
    assert pipe.table.log.latest_version() == v
    assert _final_tokens(pipe.table) == _oracle_tokens(events)


def test_n_tok_invariant(spark, feed, tmpdir_path):
    from pyspark.sql import functions as F

    feed_dir, events = feed
    pipe = CdcPipeline(
        spark, feed_dir, os.path.join(tmpdir_path, "t"), os.path.join(tmpdir_path, "c"),
        feed_schema=CDC_SCHEMA_V2, num_buckets=8,
    )
    pipe.run_available_now()
    bad = pipe.table.read().where(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_lineage_records_source_offsets(spark, feed, tmpdir_path):
    """Every applied micro-batch's commit manifest must carry its source
    offsets (input feed segments), per-bucket row counts, and the commit
    snapshot id — the per-partition lineage record the pipeline emits."""
    feed_dir, events = feed
    pipe = CdcPipeline(
        spark, feed_dir, os.path.join(tmpdir_path, "t"), os.path.join(tmpdir_path, "c"),
        feed_schema=CDC_SCHEMA_V2, num_buckets=8, max_files_per_trigger=2,
    )
    lineage = pipe.run_available_now()
    applied = [m for m in lineage if not m.get("skipped") and m.get("rows_in")]
    assert applied
    seen_files: list[str] = []
    for m in applied:
        assert m["n_input_files"] >= 1
        assert len(m["input_files"]) == min(m["n_input_files"], 64)
        assert all(f.endswith(".parquet") for f in m["input_files"])
        assert "version" in m and m["rows_after"]  # snapshot id + per-bucket rows
        seen_files.extend(m["input_files"])
    # the batches together consumed every feed file exactly once
    feed_files = sorted(
        f for root, _d, fs in os.walk(feed_dir) for f in fs if f.endswith(".parquet")
    )
    assert sorted(seen_files) == feed_files
    # and the lineage is durable: re-read the same records from the log
    snap = pipe.table.log.snapshot()
    from_log = [
        pipe.table.log.read_entry(v).manifest
        for v in range(1, snap.version + 1)
    ]
    logged = [m for m in from_log if m and m.get("n_input_files")]
    assert len(logged) == len(applied)


def test_lineage_invariants(spark, feed, tmpdir_path):
    """Self-consistency of the commit-log lineage (the machine checks
    behind cdc_lineage_metrics' buckets_ok/files_ok booleans, plus the
    ones that need the whole run): sum(rows_in) == feed event count,
    versions strictly increasing, affected buckets within range, and
    files_added matching both the entry's add-records and the files on
    disk."""
    feed_dir, events = feed
    pipe = CdcPipeline(
        spark, feed_dir, os.path.join(tmpdir_path, "t"), os.path.join(tmpdir_path, "c"),
        feed_schema=CDC_SCHEMA_V2, num_buckets=8, max_files_per_trigger=2,
    )
    pipe.run_available_now()
    table = pipe.table
    snap = table.log.snapshot()
    total_rows_in, versions = 0, []
    for v in range(1, snap.version + 1):
        entry = table.log.read_entry(v)
        m = entry.manifest
        if not m or m.get("rows_in") is None:
            continue
        versions.append(v)
        total_rows_in += m["rows_in"]
        buckets = m.get("affected_buckets", [])
        assert 1 <= len(buckets) <= table.num_buckets
        assert all(0 <= b < table.num_buckets for b in buckets)
        assert m["files_added"] == len(entry.adds) <= table.num_buckets
        for a in entry.adds:
            assert os.path.isfile(os.path.join(table.path, a["path"])), a["path"]
    assert total_rows_in == len(events)
    assert versions == sorted(versions) and len(set(versions)) == len(versions)
