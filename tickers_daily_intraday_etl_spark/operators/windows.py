"""Bounded-window analytics: SMA-5, lag deltas, guarded pct-variation.

Reference: analytics/etl_fact_analytics.py — the windowed fact table,
duplicated at minute (lines 35-107) and day (108-180) grain:

* W1/W2  ``avg(x) over (partition by key order by ts rows between 4
  preceding and current row)``  (lines :69-70, :142-143)
* W3/W4  ``lag(x) over (partition by key order by ts)``  (:71-72)
* W5     pct-variation CASE with **asymmetric** zero-guards — volume
  branches on ``previous = 0`` but close branches on ``current = 0``
  (:92-102, :165-175). Replicated faithfully.

Incremental semantics (the lookback trick, :56,:73-79,:105-106): windows
need history, so the ETL unions a bounded tail of already-published rows,
computes frames over tail+new, and emits only the new rows
(``update_flag = 1``). A key's first ≤4 rows get partial-frame SMAs and a
NULL first lag, and those published values are never revised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SMA_FRAME = (-4, 0)  # ROWS BETWEEN 4 PRECEDING AND CURRENT ROW


def pct_variation(cur: F.Column, prev: F.Column, guard_on_current: bool = False) -> F.Column:
    """100*(cur/prev - 1) with the reference's zero-guard CASE, verbatim
    (analytics/etl_fact_analytics.py:92-102).

    guard_on_current=False -> volume flavor (:92-96): branch on prev = 0.
    guard_on_current=True  -> close flavor (:98-102): branch on cur = 0 —
    the reference's asymmetry, kept faithfully.

    Deviation (documented): in the close flavor with prev = 0 and cur != 0
    the reference's ELSE divides by zero (a Redshift error); we yield NULL
    via nullif so Spark and the DuckDB oracle agree deterministically.
    """
    guard = cur if guard_on_current else prev
    other = prev if guard_on_current else cur
    return (
        F.when((guard == 0) & (other == 0), F.lit(0.0))
        .when((guard == 0) & (other != 0), F.lit(100.0))
        .otherwise(100.0 * (cur / F.nullif(prev, F.lit(0)) - 1.0))
    )


def moving_metrics(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    close_col: str,
    volume_col: str,
    frame: tuple[int, int] = SMA_FRAME,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Append the reference's five derived metrics.  ``tiebreak_cols``
    extend the window ordering to a total order when ``ts_col`` can tie
    (the reference's event_datetime is unique per ticker; generic inputs
    are not)."""
    order = [ts_col, *(tiebreak_cols or [])]
    w_ord = Window.partitionBy(key_col).orderBy(*order)
    w_frame = w_ord.rowsBetween(*frame)
    out = (
        df.withColumn("close_value_sma", F.avg(close_col).over(w_frame))
        .withColumn("volume_sma", F.avg(volume_col).over(w_frame))
        .withColumn("previous_volume_amount", F.lag(volume_col, 1).over(w_ord))
        .withColumn("previous_close_value", F.lag(close_col, 1).over(w_ord))
    )
    return out.withColumn(
        "minute_volume_amount_variation",
        pct_variation(F.col(volume_col), F.col("previous_volume_amount"), guard_on_current=False),
    ).withColumn(
        "minute_close_value_variation",
        pct_variation(F.col(close_col), F.col("previous_close_value"), guard_on_current=True),
    )


def incremental_moving_metrics(
    published: DataFrame,
    new_rows: DataFrame,
    key_col: str,
    ts_col: str,
    close_col: str,
    volume_col: str,
    lookback_rows: int = 4,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Lookback-union-window-filter (reference:
    analytics/etl_fact_analytics.py:56,73-79,105-106) — but by *row count*
    per key (exactly the frame's need) instead of the reference's 5
    time-units, which undercounts when gaps exceed the window.
    Emits only rows not already published (update_flag semantics)."""
    w_desc = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in (tiebreak_cols or [])]
    )
    tail = (
        published.withColumn("__rn", F.row_number().over(w_desc))
        .where(F.col("__rn") <= lookback_rows)
        .drop("__rn")
        .withColumn("update_flag", F.lit(0))
    )
    batch = new_rows.withColumn("update_flag", F.lit(1))
    unioned = tail.select(*batch.columns).unionByName(batch)
    metrics = moving_metrics(
        unioned, key_col, ts_col, close_col, volume_col, tiebreak_cols=tiebreak_cols
    )
    return metrics.where(F.col("update_flag") == 1).drop("update_flag")
