"""LakeTable format: create, append, snapshot isolation, schema evolution,
time travel, bucket pruning."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tickers_daily_intraday_etl_spark.lake import LakeTable
from tickers_daily_intraday_etl_spark.lake.table import merge_schemas

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _mk(spark, path, **kw):
    return LakeTable.create_if_not_exists(spark, path, SCHEMA, **kw)


def test_create_is_idempotent(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "t")
    t1 = _mk(spark, p, num_buckets=4)
    t2 = _mk(spark, p, num_buckets=8)  # second create must not reset props
    assert t1.log.latest_version() == 0
    assert t2.num_buckets == 4
    assert [f.name for f in t2.user_schema().fields] == ["doc_id", "tokens", "n_tok", "source"]


def test_append_and_read(spark, tmpdir_path):
    t = _mk(spark, os.path.join(tmpdir_path, "t"), num_buckets=4)
    df = spark.createDataFrame(
        [Row(doc_id="a", tokens=[1, 2], n_tok=2, source="s1"),
         Row(doc_id="b", tokens=[3], n_tok=1, source="s1")],
        SCHEMA,
    )
    v = t.append(df)
    assert v == 1
    out = {r.doc_id: r for r in t.read().collect()}
    assert out["a"].tokens == [1, 2]
    assert out["b"].n_tok == 1


def test_time_travel(spark, tmpdir_path):
    t = _mk(spark, os.path.join(tmpdir_path, "t"), num_buckets=2)
    t.append(spark.createDataFrame([Row(doc_id="a", tokens=[1], n_tok=1, source="s")], SCHEMA))
    t.append(spark.createDataFrame([Row(doc_id="b", tokens=[2], n_tok=1, source="s")], SCHEMA))
    assert t.read(version=1).count() == 1
    assert t.read(version=2).count() == 2
    assert t.read().count() == 2


def test_schema_evolution_add_column(spark, tmpdir_path):
    t = _mk(spark, os.path.join(tmpdir_path, "t"), num_buckets=2)
    t.append(spark.createDataFrame([Row(doc_id="a", tokens=[1], n_tok=1, source="s")], SCHEMA))
    v2 = T.StructType(SCHEMA.fields + [T.StructField("source_version", T.IntegerType(), True)])
    t.append(
        spark.createDataFrame([Row(doc_id="b", tokens=[2], n_tok=1, source="s", source_version=3)], v2)
    )
    out = {r.doc_id: r for r in t.read().collect()}
    # pre-evolution rows read back with NULL-filled new column, no rewrite
    assert out["a"].source_version is None
    assert out["b"].source_version == 3


def test_schema_evolution_widen(spark, tmpdir_path):
    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType([T.StructField("x", T.LongType())])
    assert merge_schemas(a, b)["x"].dataType == T.LongType()
    assert merge_schemas(b, a)["x"].dataType == T.LongType()
    arr_a = T.StructType([T.StructField("x", T.ArrayType(T.IntegerType()))])
    arr_b = T.StructType([T.StructField("x", T.ArrayType(T.LongType()))])
    assert merge_schemas(arr_a, arr_b)["x"].dataType == T.ArrayType(T.LongType(), True)
    bad = T.StructType([T.StructField("x", T.StringType())])
    with pytest.raises(ValueError):
        merge_schemas(a, bad)


def test_bucket_pruned_read(spark, tmpdir_path):
    t = _mk(spark, os.path.join(tmpdir_path, "t"), num_buckets=4)
    rows = [Row(doc_id=f"d{i}", tokens=[i], n_tok=1, source="s") for i in range(20)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    # per-bucket reads partition the table exactly
    total = 0
    for b in range(4):
        part = t.read_raw(buckets=[b])
        got = part.select(t.bucket_expr().alias("b")).distinct().collect()
        assert all(r.b == b for r in got)
        total += part.count()
    assert total == 20


def test_empty_table_read(spark, tmpdir_path):
    t = _mk(spark, os.path.join(tmpdir_path, "t"))
    assert t.read().count() == 0
    assert t.read().columns == ["doc_id", "tokens", "n_tok", "source"]


def test_concurrent_commit_disjoint_buckets_retries(spark, tmpdir_path):
    """Two writers on different buckets: the loser's retry succeeds."""
    from tickers_daily_intraday_etl_spark.lake.log import LogEntry

    t = _mk(spark, os.path.join(tmpdir_path, "t"), num_buckets=4)
    t.append(spark.createDataFrame([Row(doc_id="a", tokens=[1], n_tok=1, source="s")], SCHEMA))
    # interleave a disjoint commit between snapshot read and our commit
    v = t.log.latest_version()
    t.log.try_commit(LogEntry(version=v + 1, schema_json=t.stored_schema().json(), adds=[], removes=[]))
    # our append still lands (no overlap with the interleaved commit)
    v2 = t.append(spark.createDataFrame([Row(doc_id="b", tokens=[2], n_tok=1, source="s")], SCHEMA))
    assert v2 == v + 2
    assert t.read().count() == 2


def test_concurrent_commit_overlapping_files_raises(spark, tmpdir_path):
    """A concurrent rewrite of the same files aborts the stale commit."""
    import pytest as _pytest

    from tickers_daily_intraday_etl_spark.lake.log import LogEntry
    from tickers_daily_intraday_etl_spark.lake.table import ConcurrentModificationError

    t = _mk(spark, os.path.join(tmpdir_path, "t"), num_buckets=2)
    t.append(spark.createDataFrame([Row(doc_id="a", tokens=[1], n_tok=1, source="s")], SCHEMA))
    snap = t.log.snapshot()
    victim = list(snap.live_files)[0]
    # concurrent writer removes the file we also want to replace
    t.log.try_commit(
        LogEntry(version=snap.version + 1, schema_json=snap.schema_json, adds=[], removes=[victim])
    )
    with _pytest.raises(ConcurrentModificationError):
        t._commit([], [victim], t.stored_schema(), None)
