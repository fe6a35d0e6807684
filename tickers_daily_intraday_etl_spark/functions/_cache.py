"""Engine-side cache hygiene for operator-internal persists.

Several dedup/similarity operators persist an intermediate relation that
both sides of a self-join consume (re-deriving it would re-run the
expensive upstream explode+aggregate).  The RESULT DataFrames are lazy,
so the persist cannot be dropped before returning — but a long-lived
caller invoking these operators repeatedly must not accumulate one
cached relation per call until LRU pressure.

Contract: each operator registers its persists under its own key and
releases the PREVIOUS invocation's persists on entry — so at most one
generation per operator is ever cached, the returned DataFrame stays
consumable, and ``release_caches()`` lets a caller (or bench harness)
drop everything explicitly once results are materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_live: dict[str, list[DataFrame]] = {}
# (SparkContext, rdd_id) pairs for localCheckpoint RDDs, which persist at
# the RDD level and are invisible to DataFrame.unpersist
_live_rdds: dict[str, list[tuple]] = {}


def persist_tracked(key: str, df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK) and register under ``key``."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _live.setdefault(key, []).append(df)
    return df


def checkpoint_tracked(key: str, df: DataFrame) -> DataFrame:
    """``localCheckpoint`` (eager) and register the checkpoint's
    persistent RDD under ``key`` so release drops it too — otherwise
    every iterative-operator round leaks one checkpoint RDD until the
    JVM happens to GC the reference."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint()
    new_ids = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before
    _live_rdds.setdefault(key, []).extend((sc, rid) for rid in new_ids)
    return out


def release_previous(key: str) -> None:
    """Unpersist everything a prior invocation registered under ``key``.
    Called on operator ENTRY: the previous call's results have either
    been materialized by now or the caller no longer cares.

    NB: for plain persists release only means RECOMPUTE on re-access,
    but a released localCheckpoint RDD is gone — lineage was truncated,
    so a previous result DataFrame that depended on it FAILS on access
    ("checkpoint block not found").  Operators that checkpoint must say
    so in their docstring (see ``connected_components``)."""
    for df in _live.pop(key, []):
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    for sc, rid in _live_rdds.pop(key, []):
        try:
            sc._jsc.sc().unpersistRDD(rid, False)
        except Exception:
            pass


def release_caches() -> None:
    """Drop every operator-internal persist (all keys)."""
    for key in list(_live):
        release_previous(key)
