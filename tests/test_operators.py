"""Reference-semantics operators: watermark filter, moving metrics
(partial frames, zero-guards, incremental lookback), SCD-2, argmax."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from tickers_daily_intraday_etl_spark.operators import (
    argmax_label,
    incremental_filter,
    key_watermarks,
    moving_metrics,
    scd2_apply,
    surrogate_key,
)
from tickers_daily_intraday_etl_spark.operators.windows import incremental_moving_metrics


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


# ---------------------------------------------------------------- watermark
def test_incremental_filter_strictly_greater(spark):
    batch = spark.createDataFrame(
        [Row(ticker="A", ts=_ts(1), v=1.0), Row(ticker="A", ts=_ts(2), v=2.0),
         Row(ticker="A", ts=_ts(3), v=3.0), Row(ticker="B", ts=_ts(1), v=9.0)]
    )
    wm = spark.createDataFrame([Row(ticker="A", last_ts=_ts(2))])
    out = incremental_filter(batch, wm, "ticker", "ts").collect()
    # strictly greater: ts==watermark dropped; NULL watermark (B) defaults old
    got = {(r.ticker, r.ts.second) for r in out}
    assert got == {("A", 3), ("B", 1)}


def test_key_watermarks(spark):
    df = spark.createDataFrame(
        [Row(k="a", ts=_ts(5)), Row(k="a", ts=_ts(9)), Row(k="b", ts=_ts(1))]
    )
    wm = {r.k: r.last_ts.second for r in key_watermarks(df, "k", "ts").collect()}
    assert wm == {"a": 9, "b": 1}


# ------------------------------------------------------------------ windows
def test_moving_metrics_partial_frames_and_lag(spark):
    rows = [Row(ticker="A", ts=_ts(i), close=float(i + 1), vol=float(10 * (i + 1))) for i in range(7)]
    df = spark.createDataFrame(rows)
    out = (
        moving_metrics(df, "ticker", "ts", "close", "vol")
        .orderBy("ts")
        .collect()
    )
    # first row: partial frame SMA = itself, NULL lag
    assert out[0].close_value_sma == 1.0
    assert out[0].previous_close_value is None
    assert out[0].minute_close_value_variation is None  # NULL lag propagates
    # 5th row (index 4): full frame = avg(1..5)=3
    assert out[4].close_value_sma == 3.0
    # 7th row: avg(3..7)=5
    assert out[6].close_value_sma == 5.0
    assert out[6].previous_volume_amount == 60.0


def test_pct_variation_zero_guard_asymmetry(spark):
    rows = [
        Row(ticker="Z", ts=_ts(0), close=0.0, vol=0.0),
        Row(ticker="Z", ts=_ts(1), close=0.0, vol=0.0),   # prev=0,cur=0 -> 0 both
        Row(ticker="Z", ts=_ts(2), close=5.0, vol=50.0),  # vol: prev=0,cur!=0 -> 100; close: cur!=0,prev=0 -> NULL (else-branch div0)
        Row(ticker="Z", ts=_ts(3), close=0.0, vol=100.0), # close: cur=0,prev!=0 -> 100; vol: normal = 100*(100/50-1)=100
        Row(ticker="Z", ts=_ts(4), close=3.0, vol=150.0), # close: cur!=0, prev=0 -> NULL; vol: 50
    ]
    out = moving_metrics(spark.createDataFrame(rows), "ticker", "ts", "close", "vol").orderBy("ts").collect()
    assert out[1].minute_volume_amount_variation == 0.0
    assert out[1].minute_close_value_variation == 0.0
    assert out[2].minute_volume_amount_variation == 100.0
    assert out[2].minute_close_value_variation is None  # reference would div/0
    assert out[3].minute_close_value_variation == 100.0
    assert out[3].minute_volume_amount_variation == 100.0
    assert out[4].minute_volume_amount_variation == 50.0
    assert out[4].minute_close_value_variation is None


def test_incremental_moving_metrics_never_revises_published(spark):
    # first batch: 3 rows -> published with partial-frame SMAs
    b1 = spark.createDataFrame(
        [Row(ticker="A", ts=_ts(i), close=float(i + 1), vol=1.0) for i in range(3)]
    )
    pub = moving_metrics(b1, "ticker", "ts", "close", "vol")
    # second batch: 2 new rows; lookback must complete their frames
    b2 = spark.createDataFrame(
        [Row(ticker="A", ts=_ts(i), close=float(i + 1), vol=1.0) for i in range(3, 5)]
    )
    out = incremental_moving_metrics(
        pub.select("ticker", "ts", "close", "vol"), b2, "ticker", "ts", "close", "vol"
    ).orderBy("ts").collect()
    # only the NEW rows are emitted (update_flag semantics)
    assert [r.ts.second for r in out] == [3, 4]
    # and their SMAs see the tail: row ts=4 -> avg(1..5)=3
    assert out[1].close_value_sma == 3.0
    # published partial-frame rows are not in the output (never revised)


# -------------------------------------------------------------------- SCD-2
def _dim_row(k, a, b, date_from="2024-01-01", current=1.0, date_to="2099-12-31"):
    return Row(
        ticker=k, attr_a=a, attr_b=b,
        date_from=dt.date.fromisoformat(date_from),
        date_to=dt.date.fromisoformat(date_to),
        is_current=current,
    )


def test_scd2_retire_touch_insert(spark):
    dim0 = spark.createDataFrame(
        [_dim_row("A", "x", "1"), _dim_row("B", "y", "2")]
    ).withColumn("subrogate_key", surrogate_key("ticker", "attr_a", "attr_b"))
    updates = spark.createDataFrame(
        [Row(ticker="A", attr_a="x", attr_b="1"),    # unchanged -> touch
         Row(ticker="B", attr_a="y", attr_b="99"),   # changed   -> retire+insert
         Row(ticker="C", attr_a="z", attr_b="3")]    # new       -> insert
    )
    out = scd2_apply(dim0, updates, "ticker", ["attr_a", "attr_b"], "2024-06-01")
    rows = out.orderBy("ticker", "is_current").collect()
    by = {}
    for r in rows:
        by.setdefault(r.ticker, []).append(r)
    assert len(by["A"]) == 1 and by["A"][0].is_current == 1.0
    assert len(by["B"]) == 2
    old_b = [r for r in by["B"] if r.is_current == 0.0][0]
    new_b = [r for r in by["B"] if r.is_current == 1.0][0]
    assert old_b.date_to == dt.date(2024, 5, 31)  # yesterday of effective date
    assert new_b.attr_b == "99" and new_b.date_from == dt.date(2024, 6, 1)
    assert len(by["C"]) == 1 and by["C"][0].is_current == 1.0
    # exactly one current row per key
    cur_counts = (
        out.where(F.col("is_current") == 1.0).groupBy("ticker").count().collect()
    )
    assert all(r["count"] == 1 for r in cur_counts)


def test_scd2_idempotent_reapply(spark):
    dim0 = spark.createDataFrame([_dim_row("A", "x", "1")]).withColumn(
        "subrogate_key", surrogate_key("ticker", "attr_a", "attr_b")
    )
    updates = spark.createDataFrame([Row(ticker="A", attr_a="x2", attr_b="1")])
    once = scd2_apply(dim0, updates, "ticker", ["attr_a", "attr_b"], "2024-06-01")
    twice = scd2_apply(once, updates, "ticker", ["attr_a", "attr_b"], "2024-06-01")
    assert once.count() == twice.count() == 2  # re-apply inserts nothing new


def test_scd2_null_attr_retires_not_drops(spark):
    """A NULL attribute NULLs the surrogate hash; plain !=/== comparisons
    are NULL on both retire and touch predicates, silently dropping the
    current row while the anti-join re-inserts a NULL-keyed row every
    batch.  The null-safe comparisons must retire the old version exactly
    once and stay idempotent on re-apply."""
    dim0 = spark.createDataFrame([_dim_row("A", "x", "1"), _dim_row("B", "y", "2")]).withColumn(
        "subrogate_key", surrogate_key("ticker", "attr_a", "attr_b")
    )
    updates = spark.createDataFrame(
        [Row(ticker="A", attr_a=None, attr_b="1"),  # NULL attr -> retire + insert
         Row(ticker="B", attr_a="y", attr_b="2")],  # unchanged -> touch
        "ticker string, attr_a string, attr_b string",
    )
    once = scd2_apply(dim0, updates, "ticker", ["attr_a", "attr_b"], "2024-06-01")
    rows = {(r.ticker, r.is_current): r for r in once.collect()}
    assert len(rows) == 3  # A retired + A new-current + B touched
    assert rows[("A", 0.0)].attr_a == "x"  # history kept, not dropped
    assert rows[("A", 0.0)].date_to == dt.date(2024, 5, 31)
    assert rows[("A", 1.0)].attr_a is None and rows[("A", 1.0)].subrogate_key is None
    assert rows[("B", 1.0)].attr_a == "y"
    # idempotent: the NULL-hash current row must match itself on re-apply
    twice = scd2_apply(once, updates, "ticker", ["attr_a", "attr_b"], "2024-06-01")
    assert twice.count() == 3
    cur = twice.where(F.col("is_current") == 1.0).groupBy("ticker").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_null_hash_does_not_cross_keys(spark):
    """Two different keys both carrying NULL hashes must not swallow each
    other's inserts: the anti-join is keyed by (key, null-safe hash)."""
    dim0 = spark.createDataFrame(
        [_dim_row("A", None, "1")],
        "ticker string, attr_a string, attr_b string, "
        "date_from date, date_to date, is_current double",
    ).withColumn("subrogate_key", surrogate_key("ticker", "attr_a", "attr_b"))
    updates = spark.createDataFrame(
        [Row(ticker="Z", attr_a=None, attr_b="9")],
        "ticker string, attr_a string, attr_b string",
    )
    out = scd2_apply(dim0, updates, "ticker", ["attr_a", "attr_b"], "2024-06-01")
    rows = {r.ticker: r for r in out.collect()}
    assert set(rows) == {"A", "Z"}  # Z inserted despite A's NULL hash
    assert rows["Z"].is_current == 1.0


# ------------------------------------------------------------------- argmax
def test_argmax_first_max_tie_break(spark):
    df = spark.createDataFrame(
        [Row(strong_buy=3.0, buy=3.0, hold=1.0, sell=None, strong_sell=0.0)],
        "strong_buy double, buy double, hold double, sell double, strong_sell double",
    )
    cols = ["strong_buy", "buy", "hold", "sell", "strong_sell"]
    labels = ["Strong buy", "Buy", "Hold", "Sell", "Strong sell"]
    out = df.select(argmax_label(cols, labels).alias("rating")).collect()
    # tie between strong_buy and buy -> FIRST max wins (pandas idxmax parity)
    assert out[0].rating == "Strong buy"


def test_argmax_null_defaults_minus_one(spark):
    df = spark.createDataFrame([Row(a=None, b=-0.5, c=None)], "a double, b double, c double")
    out = df.select(argmax_label(["a", "b", "c"]).alias("x")).collect()
    assert out[0].x == "b"  # -0.5 beats the -1 NULL default
