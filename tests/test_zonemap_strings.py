"""String zone-map stats: truncated-but-safe per-file (min, max) for
string columns, key point-lookup file skipping, and pruning correctness
across truncation edges.

The reference's per-ticker probes
(reference: staging/extract_staging_data.py:44-45) are key-scoped
lookups; at 100 TB a point read that cannot file-skip within a bucket
scans every commit's files for that bucket.
"""

import datetime as dt
import os

from pyspark.sql import Row

from tickers_daily_intraday_etl_spark.cdc.merge import merge_into
from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA, TARGET_SCHEMA
from tickers_daily_intraday_etl_spark.lake import LakeTable
from tickers_daily_intraday_etl_spark.lake.table import (
    _STRING_STAT_PREFIX,
    _truncate_stat_bounds,
)


# ---------------------------------------------------------------- unit
def test_truncate_bounds_short_strings_exact():
    assert _truncate_stat_bounds("abc", "xyz") == ("abc", "xyz")


def test_truncate_bounds_long_min_is_prefix():
    lo = "a" * 40
    got = _truncate_stat_bounds(lo, "b")
    assert got == ("a" * _STRING_STAT_PREFIX, "b")
    assert got[0] <= lo  # safe lower bound


def test_truncate_bounds_long_max_is_incremented():
    hi = "a" * 40
    got = _truncate_stat_bounds("a", hi)
    lo_t, hi_t = got
    assert hi_t == "a" * (_STRING_STAT_PREFIX - 1) + "b"
    assert hi_t > hi  # STRICTLY above everything sharing the prefix


def test_truncate_bounds_surrogate_gap_skipped():
    hi = "x" * 15 + "퟿" + "tail-beyond-limit"
    _lo, hi_t = _truncate_stat_bounds("a", hi)
    # incrementing U+D7FF must skip the surrogate range -> U+E000
    assert hi_t[-1] == ""
    assert hi_t > hi


def test_truncate_bounds_unincrementable_max():
    assert _truncate_stat_bounds("a", "\U0010ffff" * 20) is None


# ------------------------------------------------------------- engine
def _ev(op, doc, lsn, tokens, ts_s=0):
    return Row(
        op=op,
        doc_id=doc,
        lsn=lsn,
        commit_ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s),
        tokens=tokens,
        n_tok=len(tokens),
        source="s",
    )


def test_string_stats_recorded_in_log(spark, tmpdir_path):
    t = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, num_buckets=2
    )
    merge_into(
        t,
        spark.createDataFrame(
            [_ev("I", "doc-" + "x" * 30, 1, [1]), _ev("I", "doc-b", 2, [2])], CDC_SCHEMA
        ),
        batch_id=0,
    )
    snap = t.log.snapshot()
    stats = [a["stats"] for a in snap.live_files.values() if a.get("stats")]
    assert stats, "expected zone-map stats on written files"
    key_stats = [s["doc_id"] for s in stats if "doc_id" in s]
    assert key_stats, "string key column must carry (min, max) bounds"
    for lo, hi in key_stats:
        assert len(lo) <= _STRING_STAT_PREFIX
        assert len(hi) <= _STRING_STAT_PREFIX


def test_lookup_opens_fewer_files_than_full_scan(spark, tmpdir_path):
    """Multi-commit MoR bucket: delta files carry narrow key ranges, so
    a point lookup must open only the files whose range covers the key
    (plus the bucket's base), not every live file."""
    t = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, num_buckets=1
    )
    # one bucket on purpose: bucket pruning can't help, only zone maps can
    groups = [("aaa", 0), ("mmm", 1), ("zzz", 2)]
    for prefix, b in groups:
        batch = [_ev("I", f"{prefix}-doc-{i:04d}", b * 100 + i, [i]) for i in range(20)]
        merge_into(t, spark.createDataFrame(batch, CDC_SCHEMA), batch_id=b, mode="mor")

    total_live = len(t.log.snapshot().live_files)
    assert total_live >= 3

    out = t.lookup("mmm-doc-0007")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].tokens == [7]
    opened = out.inputFiles()
    assert len(opened) < total_live, (
        f"point lookup opened {len(opened)}/{total_live} files — no skip"
    )


def test_string_bounds_pruning_correct_across_truncation(spark, tmpdir_path):
    """Keys longer than the stat prefix, clustered just around the
    truncation boundary: a pruned read must return exactly what an
    unpruned read + filter returns."""
    t = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, num_buckets=1
    )
    p = "k" * _STRING_STAT_PREFIX  # every key shares the full prefix
    keys = [p + suf for suf in ("aaa", "mmm", "zzz", "")] + ["k" * 8, p[:-1] + "l"]
    batch = [_ev("I", k, i + 1, [i]) for i, k in enumerate(keys)]
    merge_into(t, spark.createDataFrame(batch, CDC_SCHEMA), batch_id=0)

    for probe in keys:
        got = sorted(
            r.doc_id
            for r in t.read_raw(bounds={"doc_id": (probe, probe)})
            .where(f"doc_id = '{probe}'")
            .collect()
        )
        assert got == [probe], f"pruned read lost key {probe!r}"

    # range query spanning the truncated region
    lo, hi = p, p + "n"
    pruned = sorted(
        r.doc_id
        for r in t.read_raw(bounds={"doc_id": (lo, hi)})
        .where(f"doc_id >= '{lo}' and doc_id <= '{hi}'")
        .collect()
    )
    full = sorted(
        r.doc_id
        for r in t.read_raw().where(f"doc_id >= '{lo}' and doc_id <= '{hi}'").collect()
    )
    assert pruned == full and full  # non-empty and identical


def test_read_incremental_on_string_column(spark, tmpdir_path):
    """ISO-timestamp-LOOKING strings on a STRING column must be treated
    as literal string bounds (only time-typed columns coerce ISO strings
    to micros) — and the pruned result must match an unpruned filter."""
    t = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, "t"), TARGET_SCHEMA, num_buckets=1
    )
    batch = [
        _ev("I", f"d{i}", i + 1, [i]) for i in range(6)
    ]
    merge_into(t, spark.createDataFrame(batch, CDC_SCHEMA), batch_id=0)

    got = sorted(r.doc_id for r in t.read_incremental("doc_id", lo="d2", hi="d4").collect())
    assert got == ["d2", "d3", "d4"]

    # a string that PARSES as a timestamp must still bound lexically
    t2 = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, "t2"), TARGET_SCHEMA, num_buckets=1
    )
    rows = [
        _ev("I", f"k{i}", i + 1, [i]) for i in range(3)
    ]
    merge_into(t2, spark.createDataFrame(rows, CDC_SCHEMA), batch_id=0)
    # source column is constant "s": an ISO-shaped bound compares as a
    # STRING (digits sort below letters), not as a parsed timestamp —
    # hi="2024-01-01" < "s" lexically, so nothing qualifies; lo keeps all
    assert t2.read_incremental("source", hi="2024-01-01").count() == 0
    assert t2.read_incremental("source", lo="2024-01-01").count() == 3
    assert t2.read_incremental("source", lo="s", hi="s").count() == 3


def test_python_xxh64_matches_spark(spark):
    """lookup()'s driver-pure bucket computation rests on this: the
    pure-Python XXH64 must be BIT-identical to Spark's xxhash64 over
    strings (ASCII, unicode, every tail-length class of the algorithm),
    and the derived bucket must match bucket_expr."""
    import random
    import string as _string

    from pyspark.sql import functions as F

    from tickers_daily_intraday_etl_spark.lake.xxh64 import bucket_of_string, xxh64

    rng = random.Random(7)
    keys = [""]
    for length in (1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 200):
        keys.append("".join(rng.choice(_string.printable) for _ in range(length)))
    keys += ["doc-0001", "日本語テキスト", "émoji🙂mix", "a" * 1000]
    df = spark.createDataFrame([(k,) for k in keys], "k string").select(
        "k",
        F.xxhash64("k").alias("h"),
        F.pmod(F.xxhash64("k"), F.lit(16)).cast("int").alias("b"),
    )
    for r in df.collect():
        assert xxh64(r.k.encode("utf-8")) == r.h, r.k
        assert bucket_of_string(r.k, 16) == r.b, r.k


def test_lookup_integer_key_casts_literal_to_stored_type(spark, tmpdir_path):
    """Non-string key: the lookup literal must be cast to the key
    column's STORED type before hashing — xxhash64 over an IntegerType
    literal (4 bytes) and a LongType column (8 bytes) give different
    buckets, so an uncast Python int silently probes the wrong bucket
    and returns empty for existing keys."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    t = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, "ti"), schema,
        key_col="item_id", num_buckets=8,
    )
    df = spark.range(0, 200).select(
        F.col("id").alias("item_id"),
        F.concat(F.lit("p-"), F.col("id").cast("string")).alias("payload"),
    )
    t.append(df)
    for probe in (0, 7, 123, 199):
        rows = t.lookup(probe).collect()
        assert len(rows) == 1 and rows[0].payload == f"p-{probe}", (
            f"lookup({probe}) -> {rows}"
        )
    assert t.lookup(5000).collect() == []
