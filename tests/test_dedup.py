"""LWW dedup: duplicates, out-of-order LSNs, LSN ties, salting parity."""

import datetime as dt

from pyspark.sql import Row

from tickers_daily_intraday_etl_spark.cdc.dedup import lww_dedup
from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA


def _ev(op, doc, lsn, ts_s, tokens, source="s"):
    return Row(
        op=op,
        doc_id=doc,
        lsn=lsn,
        commit_ts=dt.datetime(2024, 1, 1, 0, 0, ts_s),
        tokens=tokens,
        n_tok=None if tokens is None else len(tokens),
        source=source,
    )


def test_highest_lsn_wins(spark):
    df = spark.createDataFrame(
        [_ev("I", "a", 1, 0, [1]), _ev("U", "a", 3, 2, [3]), _ev("U", "a", 2, 1, [2])],
        CDC_SCHEMA,
    )
    out = lww_dedup(df).collect()
    assert len(out) == 1
    assert out[0].lsn == 3 and out[0].tokens == [3]


def test_exact_duplicates_collapse(spark):
    df = spark.createDataFrame([_ev("I", "a", 1, 0, [1])] * 3, CDC_SCHEMA)
    out = lww_dedup(df).collect()
    assert len(out) == 1 and out[0].tokens == [1]


def test_lsn_tie_commit_ts_breaks(spark):
    df = spark.createDataFrame(
        [_ev("U", "a", 5, 1, [10]), _ev("U", "a", 5, 9, [99])], CDC_SCHEMA
    )
    out = lww_dedup(df).collect()
    assert len(out) == 1 and out[0].tokens == [99]


def test_salted_equals_unsalted(spark):
    rows = [
        _ev("U", f"d{i % 7}", 100 + i, i % 50, [i, i + 1]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    plain = {r.doc_id: (r.lsn, r.tokens) for r in lww_dedup(df).collect()}
    salted = {r.doc_id: (r.lsn, r.tokens) for r in lww_dedup(df, salt_partitions=8).collect()}
    assert plain == salted
    assert len(plain) == 7


def test_multiple_keys_independent(spark):
    df = spark.createDataFrame(
        [_ev("I", "a", 1, 0, [1]), _ev("I", "b", 2, 1, [2]), _ev("U", "b", 9, 2, [9])],
        CDC_SCHEMA,
    )
    out = {r.doc_id: r.tokens for r in lww_dedup(df).collect()}
    assert out == {"a": [1], "b": [9]}


def test_clustered_and_salted_clustered_equal_plain(spark):
    """All four plan shapes of lww_winner (plain / salted / clustered /
    salted+clustered) must pick identical winners — the clustered modes
    additionally carry the cluster column through group keys instead of
    the row struct, and the salted+clustered path runs the pre-reduce
    before the bucket repartition."""
    from pyspark.sql import functions as F

    from tickers_daily_intraday_etl_spark.cdc.dedup import lww_winner

    rows = [_ev("U", f"d{i % 23}", 100 + (i % 61), i % 50, [i]) for i in range(600)]
    df = spark.createDataFrame(rows, CDC_SCHEMA).withColumn(
        "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
    )

    def state(out):
        return {r.doc_id: (r.lsn, r.commit_ts, r.tokens, r._bucket) for r in out.collect()}

    plain = state(lww_winner(df, "doc_id", "lsn", "commit_ts"))
    assert len(plain) == 23
    for kw in (
        {"salt_partitions": 4},
        {"cluster_col": "_bucket"},
        {"cluster_col": "_bucket", "cluster_partitions": 16},
        {"salt_partitions": 4, "cluster_col": "_bucket"},
    ):
        got = state(lww_winner(df, "doc_id", "lsn", "commit_ts", **kw))
        assert got == plain, kw
