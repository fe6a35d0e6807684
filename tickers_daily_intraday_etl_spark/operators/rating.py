"""Row-wise argmax across columns -> label.

Reference: analytics/etl_dim_analytics.py:92-100 — pandas
``idxmax(axis=1)`` over five analyst-rating count columns, mapped to a
label via a dict.  pandas ``idxmax`` takes the *first* maximum, so the
``when`` chain must test columns in their original order — ties resolve
to the earlier column.  NULL counts default to -1 (reference :91).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def argmax_label(cols: list[str], labels: list[str] | None = None) -> F.Column:
    """First-max argmax over ``cols`` (ties -> earliest column), returning
    the matching label. NULLs treated as -1 like the reference."""
    labels = labels or cols
    filled = [F.coalesce(F.col(c).cast("double"), F.lit(-1.0)) for c in cols]
    top = F.greatest(*filled) if len(filled) > 1 else filled[0]
    expr = F.when(filled[0] == top, F.lit(labels[0]))
    for c, lbl in zip(filled[1:], labels[1:]):
        expr = expr.when(c == top, F.lit(lbl))
    return expr
