"""Shared plan-shaping helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small(df: DataFrame) -> DataFrame:
    """Round-robin repartition a SMALL relation to session parallelism
    before compute-dense per-row work (shingle kernels, per-token
    hashing, hyperplane dots).

    Why (guide §2.5 input skew / §6 split sizing): a compact parquet
    input (the 6 MB sf1.0 documents file) splits into ~totalBytes/
    openCostInBytes scan tasks — 6 tasks on a 32-core session — and
    every downstream map-side operator inherits that width; the dedup
    family's explode+hash work then ran 5x under-parallel (measured:
    minhash 5.3s -> 1.2s at sf1.0 with this fan-out).

    Scale-adaptive, METADATA-ONLY (no job): the repartition is planned
    only when the Catalyst size estimate says the whole input is below
    one openCost-sized split per core — exactly the regime where the
    scan under-parallelizes.  A big input (anything over ~cores * 4 MB)
    passes through untouched, so at 100 TB this is a no-op rather than
    a full-table shuffle.

    Placement caveat (measured, not hypothetical): apply it BELOW the
    compute-dense map work but ABOVE nothing a driver action touches —
    ``first()``/``collect()`` probes and count()-pruned paths execute
    the repartition for no benefit (ann_lsh_topk regressed 1.5s -> 2.2s
    with the fan-out above its dim-sniffing ``first()``).

    Lower bound: below ~64 KB/core the whole input is a fraction of a
    second of single-task work and the shuffle round-trip dominates —
    interleaved A/B at sf0.1 (~0.5-1.3 MB inputs) measured every
    fanned query 0.1-0.6s SLOWER than unfanned, while sf1.0 (~5-10 MB)
    gains 2-10x.  Both bounds scale with the core count, so the window
    tracks the session size instead of hard-coding either test scale."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes"))
    except Exception:
        open_cost = 4 * 1024 * 1024
    try:
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return df
    if cores * 65536 < size < cores * open_cost:
        return df.repartition(cores)
    return df
