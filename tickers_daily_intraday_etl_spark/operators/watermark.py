"""Incremental watermark filter — the reference's core semantic.

Reference: staging/transform_staging_data.py:47-62 — read per-key
``max(event_*)`` from the target, left-join onto the batch, default a
NULL watermark to ``2000-01-01``, keep rows **strictly greater**.

Spark-first: the watermark side is one row per key (tiny) — broadcast
it so the filter costs zero shuffles on the big side; Catalyst then
pushes the surviving predicate toward the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "2000-01-01 00:00:00"


def key_watermarks(target: DataFrame, key_col: str, ts_col: str, alias: str = "last_ts") -> DataFrame:
    """Per-key high-water mark (reference: grouped max,
    staging/transform_staging_data.py:47)."""
    return target.groupBy(key_col).agg(F.max(ts_col).alias(alias))


def incremental_filter(
    batch: DataFrame,
    watermarks: DataFrame,
    key_col: str,
    ts_col: str,
    wm_col: str = "last_ts",
    default_watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Keep batch rows strictly newer than their key's watermark.

    NULL watermark (key never seen) defaults like the reference
    (staging/transform_staging_data.py:55,60) so every first-seen row
    passes. Strict ``>`` means a row equal to the watermark is a
    duplicate and is dropped (reference line :62).
    """
    wm = F.broadcast(watermarks.select(key_col, wm_col))
    joined = batch.join(wm, on=key_col, how="left")
    # cast the default to the ts column's own type (timestamp vs
    # timestamp_ntz) so the comparison never round-trips through the
    # session timezone
    default = F.lit(default_watermark).cast(batch.schema[ts_col].dataType)
    keep = F.col(ts_col) > F.coalesce(F.col(wm_col), default)
    return joined.where(keep).drop(wm_col)
