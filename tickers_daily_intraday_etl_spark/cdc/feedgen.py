"""Deterministic synthetic binlog generator (seeded; no wall-clock).

Produces the input-hint-shaped change feed:
(op I/U/D, doc_id string, lsn long, commit_ts timestamp,
 tokens array<int32>, n_tok int32, source string [, source_version int32]).

Properties exercised (FIXTURES.md §1 scenarios):
* Zipf-skewed doc_id popularity — hot keys exercise salting/AQE skew.
* Out-of-order arrival: events are shuffled within a jitter window, so
  a segment can contain lsn gaps and late (stale) changes.
* Exact duplicates of (doc_id, lsn) rows (at-least-once feed).
* LSN ties with differing commit_ts (commit_ts is the LWW tiebreak).
* Deletes followed by re-inserts.
* A schema-evolution segment: `source_version` appears mid-stream.

The generator is numpy-vectorized on the driver for test scale and
writes the feed as N parquet "segments" (micro-batch boundaries for the
file-stream source).  At design scale the same event stream would come
from the real binlog; determinism here is what lets the replay oracle
assert byte-equality.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

BASE_TS = pd.Timestamp("2024-01-01 00:00:00")


def _token_array(rng: np.random.Generator, doc_num: int, version: int, max_len: int) -> np.ndarray:
    """Deterministic per-(doc, version) token sequence: content depends only
    on identity, not arrival order, so oracle and engine agree exactly."""
    local = np.random.default_rng((doc_num * 1_000_003 + version * 7919) & 0x7FFFFFFF)
    n = int(local.integers(1, max_len + 1))
    return local.integers(0, 50_000, size=n, dtype=np.int32)


def generate_feed(
    n_events: int,
    n_docs: int,
    seed: int = 42,
    zipf_a: float = 1.3,
    p_delete: float = 0.05,
    p_duplicate: float = 0.03,
    p_lsn_tie: float = 0.02,
    shuffle_window: int = 256,
    max_tokens: int = 64,
    evolve_at: float | None = None,
    sources: tuple[str, ...] = ("feed_a", "feed_b", "feed_c"),
) -> pd.DataFrame:
    """Build the full event stream as one pandas frame, in *arrival* order."""
    rng = np.random.default_rng(seed)

    # Zipf-skewed key choice, clipped to the key universe.
    doc_nums = (rng.zipf(zipf_a, size=n_events) - 1) % n_docs
    lsns = np.arange(1, n_events + 1, dtype=np.int64)

    # LSN ties: a sampled event reuses the previous LSN (different commit_ts).
    tie_mask = rng.random(n_events) < p_lsn_tie
    tie_mask[0] = False
    lsns[tie_mask] = lsns[np.flatnonzero(tie_mask) - 1]

    commit_ts = BASE_TS + pd.to_timedelta(np.arange(n_events), unit="s")

    ops = np.where(rng.random(n_events) < p_delete, "D", "U")
    seen: set[int] = set()
    first_seen = np.zeros(n_events, dtype=bool)
    for i, d in enumerate(doc_nums):
        if d not in seen:
            first_seen[i] = True
            seen.add(d)
    ops = np.where(first_seen, "I", ops)

    tokens = [
        None if op == "D" else _token_array(rng, int(d), int(lsn), max_tokens)
        for op, d, lsn in zip(ops, doc_nums, lsns)
    ]
    n_tok = np.array([-1 if t is None else len(t) for t in tokens], dtype=np.int32)
    src = np.array(sources, dtype=object)[rng.integers(0, len(sources), n_events)]

    df = pd.DataFrame(
        {
            "op": ops,
            "doc_id": np.char.add("doc-", doc_nums.astype(str)),
            "lsn": lsns,
            "commit_ts": commit_ts,
            "tokens": tokens,
            "n_tok": pd.array(np.where(n_tok < 0, None, n_tok), dtype="Int32"),
            "source": src,
        }
    )

    # Schema-evolution column: assigned PER EVENT before duplication, so
    # an at-least-once duplicate carries an identical payload — assigning
    # by position after the shuffle gave two copies of one event different
    # source_version values, violating the CDC tie contract (the LSN must
    # determine the payload).
    if evolve_at is not None:
        cut = int(n_events * evolve_at)
        sv = pd.array([None] * n_events, dtype="Int32")
        sv[cut:] = rng.integers(1, 4, size=n_events - cut)
        df["source_version"] = sv

    # Exact duplicates (at-least-once delivery).
    dup_idx = np.flatnonzero(rng.random(n_events) < p_duplicate)
    if len(dup_idx):
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)

    # Out-of-order arrival: shuffle within a bounded jitter window.
    jitter = rng.integers(0, shuffle_window, size=len(df))
    order = np.argsort(np.arange(len(df)) + jitter, kind="stable")
    df = df.iloc[order].reset_index(drop=True)
    return df


def write_feed_segments(df: pd.DataFrame, out_dir: str, n_segments: int) -> list[str]:
    """Write the arrival-ordered stream as consecutive parquet segments.
    If a schema-evolution column exists, pre-evolution segments omit it
    entirely (the column genuinely appears mid-stream)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, len(df), n_segments + 1).astype(int)
    for i in range(n_segments):
        seg = df.iloc[bounds[i] : bounds[i + 1]]
        if "source_version" in seg.columns and seg["source_version"].isna().all():
            seg = seg.drop(columns=["source_version"])
        table = pa.Table.from_pandas(seg, preserve_index=False)
        # tokens must be list<int32>, lsn int64 — coerce explicitly
        fields = []
        for f in table.schema:
            if f.name == "tokens":
                fields.append(pa.field("tokens", pa.list_(pa.int32())))
            elif f.name == "n_tok":
                fields.append(pa.field("n_tok", pa.int32()))
            elif f.name == "source_version":
                fields.append(pa.field("source_version", pa.int32()))
            elif f.name == "commit_ts":
                fields.append(pa.field("commit_ts", pa.timestamp("us")))
            else:
                fields.append(f)
        table = table.cast(pa.schema(fields))
        path = os.path.join(out_dir, f"segment-{i:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
    return paths


def spark_generate_feed(
    spark,
    n_events: int,
    n_docs: int,
    n_segments: int,
    out_dir: str,
    max_tokens: int = 64,
    p_delete: float = 0.05,
    hot_fraction: float = 0.1,
    files_per_segment: int = 32,
):
    """Distributed deterministic feed generator (for bench scale).

    All columns derive from xxhash64 of the event id — no RNG state, no
    driver-side loop, so the same (n_events, n_docs) always produces the
    same feed at any parallelism.  ``hot_fraction`` of events hit a key
    universe 1000x smaller (Zipf-ish head) to exercise skew handling.
    Writes ``n_segments`` parquet segment directories (micro-batch
    boundaries for the file-stream source) and returns the event count.
    """
    from pyspark.sql import functions as F

    hot_docs = max(1, n_docs // 1000)
    # enough files per segment that a local[32] (or 4N-executor) reader
    # gets full scan parallelism from the smallest micro-batch
    ids = spark.range(1, n_events + 1, 1, numPartitions=n_segments * files_per_segment)
    h = F.xxhash64(F.col("id"))
    is_hot = F.pmod(h, F.lit(int(1 / max(hot_fraction, 1e-9)))) == 0
    doc_num = F.when(is_hot, F.pmod(F.xxhash64(F.col("id") * 7), F.lit(hot_docs))).otherwise(
        F.pmod(h, F.lit(n_docs))
    )
    is_del = F.pmod(F.xxhash64(F.col("id") + 13), F.lit(int(1 / max(p_delete, 1e-9)))) == 0
    tok_len = (F.pmod(F.xxhash64(F.col("id") + 29), F.lit(max_tokens)) + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), tok_len),
        lambda i: F.pmod(F.xxhash64(F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))), F.lit(50_000)).cast("int"),
    )
    feed = ids.select(
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("doc-"), doc_num.cast("string")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("commit_ts"),
        F.when(is_del, F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(tok_len).alias("n_tok"),
        F.concat(F.lit("feed_"), F.pmod(h, F.lit(3)).cast("string")).alias("source"),
        F.floor((F.col("id") - 1) * n_segments / n_events).cast("int").alias("__seg"),
    )
    for seg in range(n_segments):
        (
            feed.where(F.col("__seg") == seg)
            .drop("__seg")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"segment-{seg:05d}"))
        )
    return n_events
