"""Physical-plan policy: pushdown reaches the scan, small sides
broadcast, codegen covers the hot paths, no per-row Python anywhere."""

from pyspark.sql import functions as F

from tickers_daily_intraday_etl_spark import plans
from tickers_daily_intraday_etl_spark.operators import incremental_filter, key_watermarks

SF = "/root/testdata/sf0.001"


def test_no_row_wise_python_in_engine():
    violations = plans.find_slow_path_violations()
    assert violations == [], "\n".join(violations)


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_quantity") > 25.0)
        .select("l_orderkey", "l_quantity")
    )
    ex = plans.explain_str(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)" in ex
    # column pruning: only the 2 projected (+filter) columns in ReadSchema
    assert "l_extendedprice" not in ex.split("ReadSchema")[1].splitlines()[0]


def test_watermark_filter_broadcasts_small_side(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    wm = key_watermarks(events.limit(100), "user_id", "ts")
    out = incremental_filter(events, wm, "user_id", "ts")
    assert plans.uses_broadcast_join(out)


def test_hot_path_has_codegen(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    agg.collect()  # AQE only annotates codegen in the executed final plan
    assert plans.has_whole_stage_codegen(agg)


def test_slow_path_audit_actually_scans_and_flags(tmp_path):
    """Guard against the audit silently scanning nothing (regression: the
    default root once pointed at a nonexistent dir and the test above was
    vacuous)."""
    import os

    import tickers_daily_intraday_etl_spark as pkg

    pkg_root = os.path.dirname(os.path.abspath(pkg.__file__))
    scanned = plans.find_slow_path_violations(pkg_root)
    assert scanned == []
    # nonexistent root would also return [] — prove the scanner sees files
    bad = tmp_path / "mod.py"
    bad.write_text("df.rdd.map(lambda r: r)\n")
    hits = plans.find_slow_path_violations(str(tmp_path))
    assert len(hits) == 1 and "mod.py:1" in hits[0]


def test_embedding_near_pairs_has_no_cartesian_product(spark):
    """The near-pair queries must stay bucket-join-shaped: any
    CartesianProduct / BroadcastNestedLoopJoin means an all-pairs plan
    snuck back in (the 100-TB killer the LSH bucketing exists to avoid)."""
    from tickers_daily_intraday_etl_spark.queries import QUERIES

    for name in ("embedding_near_pairs", "ann_lsh_topk", "simhash_near_pairs",
                 "lsh_candidate_pairs", "ngram_jaccard_pairs"):
        ex = plans.explain_str(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in ex, name
        assert "BroadcastNestedLoopJoin" not in ex, name


def test_clustered_lww_is_single_exchange(spark):
    """The merge-path LWW (cluster_col=_bucket) must plan exactly ONE
    hash exchange: the explicit bucket repartition both satisfies the
    groupBy(bucket, key) clustering (Catalyst elides the aggregate's own
    exchange) and pre-positions the output for the bucket-partitioned
    write.  A second exchange here doubles the payload bytes every merge
    moves through the memory subsystem — the measured throughput ceiling
    (BENCH/roofline.md)."""
    from tickers_daily_intraday_etl_spark.cdc.dedup import lww_winner

    df = spark.range(10_000).select(
        F.concat(F.lit("doc-"), F.pmod(F.xxhash64("id"), F.lit(500)).cast("string")).alias("doc_id"),
        F.col("id").alias("_lsn"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("_commit_ts"),
        F.sequence(F.lit(1), F.lit(8)).alias("tokens"),
    ).withColumn("_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int"))
    clustered = lww_winner(df, "doc_id", "_lsn", "_commit_ts", cluster_col="_bucket")
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # and the one exchange is the bucket repartition, not a key shuffle
    assert "REPARTITION_BY_NUM" in plan
    # unclustered reference shape still has its own (key) exchange
    plain = lww_winner(df, "doc_id", "_lsn", "_commit_ts")
    pplan = plain._jdf.queryExecution().executedPlan().toString()
    assert pplan.count("Exchange hashpartitioning") == 1
    # results identical either way (same winners, order-insensitive)
    a = sorted(map(tuple, clustered.drop("tokens").collect()))
    b = sorted(map(tuple, plain.drop("tokens").collect()))
    assert a == b


def test_scan_pushes_filters_tolerates_mixed_plans(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").where(F.col("l_quantity") > 25.0)
    orders = spark.read.parquet(f"{SF}/orders.parquet")  # full scan side
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    assert plans.scan_pushes_filters(joined)  # one pushed scan suffices
