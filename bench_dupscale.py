"""Corpus-scaling evidence for the dedup family (VERDICT r4 #5).

The sf0.1 bench times for ``dup_clusters`` (~6.8s) measure per-stage
fixed overhead, not the algorithm — CC-only is ~2.7s and LSH candidate
generation ~3.2s at 5k docs.  This harness scales the DOCUMENT CORPUS
(not the fixed cost) by exploding the sf0.1 documents table with
deterministic token-disjoint variants (each variant copy reproduces the
original corpus's near-dup structure under ``_near_docs``'s %-based
injections, so candidate-pair density stays ~constant per doc), then
times ``lsh_candidate_pairs`` and ``dup_clusters`` at 1x / 4x / 10x.

Expected shape at scale: pair count ~linear in docs, wall time
~linear (band-bucket joins + O(log n) CC rounds), NOT quadratic.
Appends one JSON line per multiplier to BENCH/history.jsonl.

Usage: python bench_dupscale.py   [DUPSCALE_MULTS=1,4,10]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

MULTS = [int(x) for x in os.environ.get("DUPSCALE_MULTS", "1,4,10").split(",")]
SRC_SF = os.environ.get("DUPSCALE_SRC", "/root/testdata/sf0.1")
VARIANT_BASE = 16  # doc_id = orig * 16 + variant; stays far below the
# +1_000_000 / +2_000_000 id ranges _near_docs reserves for injected dups


def build_corpus(spark, mult: int, out_dir: str) -> int:
    """Explode the source documents table by ``mult`` deterministic
    variants.  Variant 0 keeps the original text; variants >0 suffix
    EVERY token with a variant+doc salt, making their token sets
    disjoint from all other variants — each copy is an independent
    corpus for shingle/minhash purposes, so near-dup density per doc is
    preserved while corpus size scales."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SRC_SF, "documents.parquet"))
    variants = spark.range(mult).select(F.col("id").cast("int").alias("v"))
    out = (
        docs.crossJoin(F.broadcast(variants))
        .select(
            (F.col("doc_id") * VARIANT_BASE + F.col("v")).alias("doc_id"),
            F.when(F.col("v") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"),
                    r"(\S+)",
                    F.concat(
                        F.lit("$1_"),
                        F.col("v").cast("string"),
                        F.lit("s"),
                        F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
                    ),
                )
            )
            .alias("text"),
            F.col("lang"),
            F.col("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return out.count()


def main() -> None:
    from tickers_daily_intraday_etl_spark.queries import QUERIES
    from tickers_daily_intraday_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dup-scale-bench", cpus=cpus, shuffle_partitions=cpus)
    base = os.path.join("/tmp", f"dupscale_{uuid.uuid4().hex}")
    results = []
    for mult in MULTS:
        sf_dir = os.path.join(base, f"x{mult}")
        n_docs = build_corpus(spark, mult, sf_dir)
        rec = {"kind": "dupscale", "mult": mult, "docs": n_docs, "cpus": cpus}
        for qname in ("lsh_candidate_pairs", "dup_clusters"):
            best = None
            for _ in range(2):  # best-of-2, cache-clean draws
                t0 = time.time()
                n = QUERIES[qname](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            rec[qname] = {"rows": n, "sec": round(best, 2)}
            print(f"x{mult} ({n_docs} docs) {qname}: {n} rows in {best:.2f}s",
                  file=sys.stderr)
        results.append(rec)
    print(json.dumps(results))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/history.jsonl", "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
