"""Streaming windows + custom stateful operator, driven through real
streaming queries (file source -> memory sink)."""

import datetime as dt
import os
import uuid

from pyspark.sql import Row
from pyspark.sql import types as T

from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA
from tickers_daily_intraday_etl_spark.streaming.windows import (
    session_event_counts,
    stateful_lww_filter,
    windowed_event_counts,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user", T.StringType()),
    ]
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}")


def test_tumbling_window_counts(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "ev")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [Row(ts=base + dt.timedelta(minutes=m), user="u1") for m in (0, 1, 6, 7, 8)]
    rows += [Row(ts=base + dt.timedelta(minutes=2), user="u2")]
    # a "late" event far past the watermark horizon of the others
    _write_events(spark, path, rows)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(path)
    out = _drain(
        spark,
        windowed_event_counts(stream, "ts", "user", window="5 minutes", watermark="0 seconds"),
        f"win_{uuid.uuid4().hex[:8]}",
        mode="complete",  # append would hold back windows the watermark has not passed
    )
    got = {(r.window_start.minute, r.user): r.n for r in out.collect()}
    assert got[(0, "u1")] == 2 and got[(5, "u1")] == 3 and got[(0, "u2")] == 1


def test_session_window_counts(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "ev")
    base = dt.datetime(2024, 1, 1)
    # two sessions for u1: minutes 0-2 and minutes 30-31 (gap 5m)
    rows = [Row(ts=base + dt.timedelta(minutes=m), user="u1") for m in (0, 1, 2, 30, 31)]
    _write_events(spark, path, rows)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(path)
    out = _drain(
        spark,
        session_event_counts(stream, "ts", "user", gap="5 minutes", watermark="0 seconds"),
        f"sess_{uuid.uuid4().hex[:8]}",
        mode="complete",
    )
    ns = sorted(r.n for r in out.collect())
    assert ns == [2, 3]


def test_stateful_lww_filter_across_batches(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "feed")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    def ev(doc, lsn, op="U"):
        return Row(
            op=op, doc_id=doc, lsn=lsn,
            commit_ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=lsn),
            tokens=[1], n_tok=1, source="s",
        )

    spark.createDataFrame([ev("a", 5), ev("a", 3), ev("b", 1)], CDC_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)

    emitted: list[tuple] = []

    def run():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        stream = spark.readStream.schema(CDC_SCHEMA).parquet(path)
        q = (
            stateful_lww_filter(stream)
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend((r.doc_id, r.lsn) for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # batch 1: a@3 and a@5 both exceed the empty state's -1 (in lsn order),
    # b@1 passes
    assert ("a", 5) in emitted and ("b", 1) in emitted

    # batch 2: stale a@4 must be dropped by the carried state; a@9 passes
    spark.createDataFrame([ev("a", 4), ev("a", 9)], CDC_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)
    run()
    assert ("a", 9) in emitted
    assert ("a", 4) not in emitted
