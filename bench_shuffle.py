"""Shuffle bytes/event A/B: bucket-clustered LWW merge vs the legacy
plan shape (salted groupBy(key) + write-side repartition).

The round-4 roofline (BENCH/roofline.md) established the CDC merge is
memory-bandwidth-bound on this host, so bytes moved per event — not CPU
— is the scaling lever.  This harness runs the IDENTICAL batched merge
job over the IDENTICAL pre-generated feed under both plan shapes in
separate JVMs, sums Spark's own per-stage shuffle metrics via the UI
REST API, and reports bytes/event + wall time for each.

Usage:
  python bench_shuffle.py                      # full A/B, writes BENCH/shuffle_bytes.md
  python bench_shuffle.py --worker VARIANT FEED_DIR WORK_DIR   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import uuid

N_EVENTS = int(os.environ.get("SHUFFLE_BENCH_EVENTS", "2000000"))
N_DOCS = max(1000, N_EVENTS // 20)
N_SEGMENTS = 4
CPUS = int(os.environ.get("SHUFFLE_BENCH_CPUS", "8"))

# variant -> merge_into kwargs.  'legacy' reproduces the round-4
# production shape exactly (salt 16 as bench_scaling.py then used).
VARIANTS = {
    "clustered": {"clustered": True, "salt_partitions": 0},
    "legacy": {"clustered": False, "salt_partitions": 16},
}


def _rest_shuffle_totals(spark) -> dict[str, int]:
    """Sum shuffle read/write bytes over all completed stages from the
    UI REST API (Spark's own executor-reported metrics)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl  # e.g. http://host:4040
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "n_stages": len(stages),
    }


def worker(variant: str, feed_dir: str, work_dir: str) -> None:
    from tickers_daily_intraday_etl_spark.cdc.merge import merge_into
    from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA, payload_fields
    from tickers_daily_intraday_etl_spark.lake.table import LakeTable
    from tickers_daily_intraday_etl_spark.session import get_spark

    from pyspark.sql import types as T

    kw = VARIANTS[variant]
    spark = get_spark(
        f"cdc-shuffle-{variant}",
        cpus=CPUS,
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics source for this A/B
            "spark.local.dir": os.path.join(work_dir, "spark-local"),
        },
    )
    table = LakeTable.create_if_not_exists(
        spark,
        os.path.join(work_dir, "table"),
        T.StructType(payload_fields(CDC_SCHEMA)),
        num_buckets=128,
    )
    segs = sorted(
        os.path.join(feed_dir, d) for d in os.listdir(feed_dir) if d.startswith("segment-")
    )
    # JIT warm-up on the first segment into a throwaway table, so the
    # measured stages are compiled-code stages for both variants alike
    wu = LakeTable.create_if_not_exists(
        spark, os.path.join(work_dir, "wu-table"),
        T.StructType(payload_fields(CDC_SCHEMA)), num_buckets=128,
    )
    merge_into(wu, spark.read.schema(CDC_SCHEMA).parquet(segs[0]), batch_id="wu", **kw)
    pre = _rest_shuffle_totals(spark)
    t0 = time.time()
    rows = 0
    for i, seg in enumerate(segs):
        batch = spark.read.schema(CDC_SCHEMA).parquet(seg)
        m = merge_into(table, batch, batch_id=i, **kw)
        rows += m["rows_in"]
    dt = time.time() - t0
    time.sleep(1.0)  # let the listener bus drain the final stage metrics
    post = _rest_shuffle_totals(spark)
    out = {
        "variant": variant,
        "sec": round(dt, 2),
        "rows_in": rows,
        "events_per_sec": round(rows / dt, 1),
        "shuffle_write_bytes": post["shuffle_write_bytes"] - pre["shuffle_write_bytes"],
        "shuffle_read_bytes": post["shuffle_read_bytes"] - pre["shuffle_read_bytes"],
        "shuffle_write_bytes_per_event": round(
            (post["shuffle_write_bytes"] - pre["shuffle_write_bytes"]) / rows, 1
        ),
    }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4])
        return

    from tickers_daily_intraday_etl_spark.cdc.feedgen import spark_generate_feed
    from tickers_daily_intraday_etl_spark.session import get_spark

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    base = os.path.join(shm, f"cdc_shuffle_{uuid.uuid4().hex}")
    feed_dir = os.path.join(base, "feed")
    print(f"generating {N_EVENTS} events -> {feed_dir}", file=sys.stderr)
    spark = get_spark("cdc-shuffle-gen", cpus=CPUS)
    spark_generate_feed(spark, N_EVENTS, N_DOCS, N_SEGMENTS, feed_dir)
    spark.stop()

    results = {}
    for variant in ("legacy", "clustered"):
        work = os.path.join(base, f"run-{variant}")
        out = subprocess.run(
            [sys.executable, __file__, "--worker", variant, feed_dir, work],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        results[variant] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[variant], file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)

    red = (
        results["legacy"]["shuffle_write_bytes"]
        / max(1, results["clustered"]["shuffle_write_bytes"])
    )
    summary = {
        "metric": "merge shuffle-write bytes/event, legacy vs bucket-clustered",
        "events": N_EVENTS,
        "cpus": CPUS,
        "legacy": results["legacy"],
        "clustered": results["clustered"],
        "shuffle_bytes_reduction_x": round(red, 2),
    }
    print(json.dumps(summary))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/shuffle_bytes.md", "w") as f:
        f.write(
            "# Shuffle bytes/event: legacy vs bucket-clustered merge\n\n"
            f"Same batched CoW merge job ({N_EVENTS:,} events, 4 batches, 128\n"
            f"buckets, local[{CPUS}], separate JVMs, JIT-warmed), shuffle bytes\n"
            "summed from Spark's per-stage REST metrics over the measured\n"
            "batches only.\n\n"
            "| variant | shuffle write B/event | total shuffle write | sec | events/s |\n"
            "|---|---|---|---|---|\n"
            + "".join(
                f"| {v} | {r['shuffle_write_bytes_per_event']} | "
                f"{r['shuffle_write_bytes']:,} | {r['sec']} | {r['events_per_sec']:,} |\n"
                for v, r in results.items()
            )
            + f"\n**Reduction: {red:.2f}x fewer shuffle-write bytes/event.**\n\n"
            "Legacy = round-4 production shape: salted (16) two-phase\n"
            "groupBy(key) LWW + write-side repartition(bucket) — three\n"
            "payload crossings.  Clustered = one explicit repartition(n,\n"
            "bucket) that satisfies both the groupBy(bucket, key) clustering\n"
            "and the partitioned write (cdc/dedup.py lww_winner cluster_col).\n"
            "One payload crossing is the floor for copy-on-write: every\n"
            "output byte must reach its bucket's writer task at least once.\n"
        )
    with open("BENCH/history.jsonl", "a") as f:
        f.write(json.dumps({"kind": "shuffle_bytes_ab", **summary}) + "\n")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
