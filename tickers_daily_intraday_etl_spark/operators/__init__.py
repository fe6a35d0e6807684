"""Reference-semantics operators, re-expressed as DataFrame transforms.

Each operator carries the exact semantics of its reference counterpart
(cited in its docstring) but is implemented Spark-first: broadcastable
watermark joins, window frames, single-shuffle SCD-2 merges.
"""

from tickers_daily_intraday_etl_spark.operators.watermark import incremental_filter, key_watermarks
from tickers_daily_intraday_etl_spark.operators.windows import moving_metrics, pct_variation
from tickers_daily_intraday_etl_spark.operators.scd2 import scd2_apply, surrogate_key
from tickers_daily_intraday_etl_spark.operators.rating import argmax_label

__all__ = [
    "incremental_filter",
    "key_watermarks",
    "moving_metrics",
    "pct_variation",
    "scd2_apply",
    "surrogate_key",
    "argmax_label",
]
