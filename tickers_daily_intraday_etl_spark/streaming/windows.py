"""Event-time streaming constructs: watermarked tumbling/sliding windows,
session windows, and a custom stateful LWW filter.

The reference has no streaming runtime — its daily cron poll + watermark
diff (reference: dags/etl_dag.py:27, staging/transform_staging_data.py:47-62)
is the batch emulation of exactly these constructs.  The engine provides
the real ones:

* ``windowed_event_counts`` — watermark + tumbling/sliding window agg
  (late data beyond the watermark dropped, mirroring the reference's
  strict ``>`` filter).
* ``session_event_counts`` — session windows (gap-based).
* ``stateful_lww_filter`` — applyInPandasWithState: per-key applied-LSN
  high-water mark kept in state; only first-seen-or-newer events pass.
  This is the fully-streaming alternative to the MERGE path for
  downstream consumers that want a deduped changelog, not a table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def session_event_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n",
        )
    )


_LWW_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
    ]
)
_LWW_STATE_SCHEMA = T.StructType([T.StructField("max_lsn", T.LongType())])


def _lww_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key applied-LSN high-water mark (the reference's per-ticker
    max(event_date) watermark, staging/transform_staging_data.py:47,
    as true streaming state)."""
    import numpy as np

    (max_lsn,) = state.get if state.exists else (-1,)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("lsn", kind="stable")
        lsn = pdf["lsn"].to_numpy()
        # strictly-increasing filter with the mark advancing ROW by row —
        # a duplicate LSN inside one Arrow chunk must be dropped exactly
        # like one split across chunks, or output depends on
        # spark.sql.execution.arrow.maxRecordsPerBatch (nondeterminism)
        prev = np.concatenate(([max_lsn], lsn[:-1]))
        keep = lsn > np.maximum.accumulate(prev)
        newer = pdf[keep]
        if len(newer):
            max_lsn = int(newer["lsn"].iloc[-1])
            out.append(newer[["doc_id", "lsn", "op", "n_tok"]])
    state.update((max_lsn,))
    if out:
        yield pd.concat(out)


def stateful_lww_filter(stream: DataFrame) -> DataFrame:
    """Deduped changelog: drops events at-or-below each key's applied-LSN
    high-water mark, carrying the mark in streaming state."""
    return stream.groupBy("doc_id").applyInPandasWithState(
        _lww_state_fn,
        outputStructType=_LWW_OUT_SCHEMA,
        stateStructType=_LWW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
