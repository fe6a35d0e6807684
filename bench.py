"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus a CDC upsert-throughput microbench
(synthetic binlog -> streaming MERGE).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "cdc": {...}}

For the two-parallelism scaling evidence (N vs 4N cores), run
bench_scaling.py — it executes the same CDC job at local[8] and
local[32] in separate processes and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


HEADLINE = [
    "cdc_merge_final_state",
    "cdc_lww_dedup",
    "watermark_incremental",
    "grouped_watermarks",
    "moving_metrics_fact",
    "scd2_dim",
    "argmax_event_type",
    "text_stats",
    "lang_id",
    "exact_dup_groups",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "dup_clusters",
    "ngram_jaccard_pairs",
    "simhash_32",
    "simhash_near_pairs",
    "cosine_topk",
    "embedding_near_pairs",
    "ann_lsh_topk",
    "ivf_topk",
    "doc_fingerprints",
    "pricing_summary",
    "top_revenue_customers",
]


def run_cdc_throughput(spark, sf: float) -> dict:
    """Streaming CDC microbench: events/sec through the full pipeline
    (feed segments -> readStream -> dedup -> bucket-pruned MERGE)."""
    from tickers_daily_intraday_etl_spark.cdc.feedgen import generate_feed, write_feed_segments
    from tickers_daily_intraday_etl_spark.streaming import CdcPipeline

    n_events = max(20_000, int(2_000_000 * sf))
    n_docs = max(1_000, n_events // 20)
    work = os.path.join("/tmp", f"cdc_bench_{uuid.uuid4().hex}")
    feed_dir = os.path.join(work, "feed")
    events = generate_feed(n_events=n_events, n_docs=n_docs, seed=42)
    write_feed_segments(events, feed_dir, n_segments=4)
    # JIT warm-up (same convention as bench_scaling.py): the first
    # streaming micro-batch otherwise absorbs the merge pipeline's
    # whole-stage-codegen compilation (~3s measured), which is a
    # per-JVM constant, not a per-event cost
    wu = generate_feed(n_events=20_000, n_docs=1_000, seed=7)
    write_feed_segments(wu, os.path.join(work, "feed-wu"), n_segments=1)
    CdcPipeline(
        spark, os.path.join(work, "feed-wu"),
        os.path.join(work, "table-wu"), os.path.join(work, "ckpt-wu"),
        num_buckets=64,
    ).run_available_now()
    # each variant is timed best-of-2 over fresh tables/checkpoints —
    # the same noise treatment the headline queries get (the host's
    # co-tenant bandwidth bursts hit single draws for ±50%)
    def timed_drain(feed, tag, n_draws=2, **kw):
        best = None
        for d in range(n_draws):
            p = CdcPipeline(
                spark, feed,
                os.path.join(work, f"table-{tag}{d}"),
                os.path.join(work, f"ckpt-{tag}{d}"),
                num_buckets=64, **kw,
            )
            t0 = time.time()
            p.run_available_now()
            best = min(time.time() - t0, best) if best is not None else time.time() - t0
        return best

    total = len(events)
    dt = timed_drain(feed_dir, "pf", max_files_per_trigger=1)
    # second variant: the same feed drained as ONE micro-batch — the
    # steady-state number (per-file batches above are fixed-cost bound;
    # at 10^10 events real batches are segment-sized, not file-sized)
    dt_big = timed_drain(feed_dir, "big")
    # third variant: a 2M-event feed in large segments — the sustained
    # bulk rate with fixed costs amortized (the number comparable to the
    # scaling bench's per-level throughput; the sf-scaled feed above is
    # small enough that per-batch overhead dominates it)
    bulk_events = 2_000_000
    bulk_feed = os.path.join(work, "feed-bulk")
    bulk = generate_feed(n_events=bulk_events, n_docs=bulk_events // 20, seed=43)
    write_feed_segments(bulk, bulk_feed, n_segments=2)
    dt_bulk = timed_drain(bulk_feed, "bulk")
    shutil.rmtree(work, ignore_errors=True)
    return {
        "events": total,
        "sec": round(dt, 3),
        "events_per_sec": round(total / dt, 1),
        "single_batch_sec": round(dt_big, 3),
        "single_batch_events_per_sec": round(total / dt_big, 1),
        "bulk_events": bulk_events,
        "bulk_sec": round(dt_bulk, 3),
        "bulk_events_per_sec": round(bulk_events / dt_bulk, 1),
    }


def run_mor_sparse_bench(spark, sf: float) -> dict:
    """Write-amplification microbench: seed a wide table, then apply small
    update batches in CoW vs MoR mode.  Reports rows written per mode —
    the metric that decides which mode a sparse-update feed should use."""
    import tempfile

    from tickers_daily_intraday_etl_spark.cdc.feedgen import generate_feed
    from tickers_daily_intraday_etl_spark.cdc.merge import merge_into
    from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA, TARGET_SCHEMA
    from tickers_daily_intraday_etl_spark.lake import LakeTable

    n_docs = max(2_000, int(200_000 * sf))
    base = generate_feed(n_events=n_docs * 2, n_docs=n_docs, seed=21, p_delete=0.0)
    updates = generate_feed(n_events=max(200, n_docs // 50), n_docs=n_docs, seed=22, p_delete=0.0).copy()
    updates["lsn"] = updates["lsn"] + 10_000_000
    work = tempfile.mkdtemp(prefix="cdc_mor_bench_")
    out: dict = {"seed_docs": n_docs, "update_events": len(updates)}
    for mode in ("cow", "mor"):
        t = LakeTable.create_if_not_exists(
            spark, os.path.join(work, mode), TARGET_SCHEMA, num_buckets=64
        )
        merge_into(t, spark.createDataFrame(base, schema=CDC_SCHEMA), batch_id=0)
        t0 = time.time()
        merge_into(t, spark.createDataFrame(updates, schema=CDC_SCHEMA), batch_id=1,
                   mode=mode)
        dt = time.time() - t0
        snap = t.log.snapshot()
        rows_written = sum(a["rows"] for a in t.log.read_entry(snap.version).adds)
        out[mode] = {"update_sec": round(dt, 3), "rows_written": rows_written}
    out["write_amplification_cow_over_mor"] = round(
        out["cow"]["rows_written"] / max(out["mor"]["rows_written"], 1), 1
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"SPARK_GRAFT_SF_DIR does not exist: {sf_dir}")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.0  # non-sf-named dir: scale-dependent sizing falls back to minimums

    from tickers_daily_intraday_etl_spark.queries import QUERIES
    from tickers_daily_intraday_etl_spark.session import get_spark

    spark = get_spark("cdc-engine-bench", cpus=cpus, shuffle_partitions=cpus)

    # JIT warm-up: run one mid-weight query untimed so the first timed
    # query doesn't absorb the JVM's compilation cost
    QUERIES["cdc_lww_dedup"](spark, sf_dir).count()

    # best-of-N per query (clearCache between draws): round headlines
    # were single-draw noisy (~±10% on the sub-4s queries); the best is
    # the capability estimate, the median is reported alongside
    draws_n = int(os.environ.get("SPARK_GRAFT_BENCH_DRAWS", "2"))
    import statistics

    timings: dict[str, float] = {}
    timings_median: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        draws: list[float] = []
        for _ in range(draws_n):
            t0 = time.time()
            n = q(spark, sf_dir).count()
            draws.append(time.time() - t0)
            # the pair queries persist their shared explode relations;
            # drop them between draws/queries so caches can't leak one
            # draw's materialization into the next
            spark.catalog.clearCache()
        timings[name] = round(min(draws), 3)
        timings_median[name] = round(statistics.median(draws), 3)
        log(f"{name}: {n} rows, best {min(draws):.2f}s of {[round(d, 2) for d in draws]}")

    cdc = run_cdc_throughput(spark, sf)
    log(f"cdc throughput: {cdc}")
    mor = run_mor_sparse_bench(spark, sf)
    log(f"mor sparse-update: {mor}")

    # round-1 had 18 headline queries; 4 more were added since.  The raw
    # sum is not comparable across rounds, so also report the sum over the
    # original query set.
    r01_set = [n for n in HEADLINE if n not in
               ("simhash_near_pairs", "ann_lsh_topk", "ivf_topk", "doc_fingerprints",
                "dup_clusters")]
    out = {
        "metric": "headline query wall time + CDC upsert throughput",
        "value": round(sum(timings.values()), 3),
        "value_r01_queryset": round(sum(timings[n] for n in r01_set), 3),
        "unit": "sec",
        "queries": timings,
        "queries_median": timings_median,
        "bench_draws_per_query": draws_n,
        "sf": sf,
        "cpus": cpus,
        "cdc": cdc,
        "mor_sparse": mor,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
