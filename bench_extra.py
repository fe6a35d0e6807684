"""Round-6 optimization harness (guide §1): per-query isolation with the
noop sink, plan capture, and labelled jobs.

NOT the graded bench — ``bench.py`` is frozen for measurement.  This
file exists so individual queries can be timed/re-timed cheaply while
optimizing, and so ``plans/r06/*_{before,after}.txt`` snapshots come
from one command.

Usage:
  python bench_extra.py [query ...]            # time listed queries (default: all headline)
  PLAN_TAG=before python bench_extra.py q ...  # also dump explain to plans/r06/<q>_<tag>.txt
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 ...  # scale selection, same env as bench.py
  DRAWS=3 python bench_extra.py q              # draws per query (default 2, report all + best)
  SINK=count python bench_extra.py q           # time .count() exactly like bench.py (default: noop)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    draws = int(os.environ.get("DRAWS", "2"))
    sink = os.environ.get("SINK", "noop")
    plan_tag = os.environ.get("PLAN_TAG", "")

    from bench import HEADLINE
    from tickers_daily_intraday_etl_spark.queries import QUERIES
    from tickers_daily_intraday_etl_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("cdc-engine-bench-extra", cpus=cpus, shuffle_partitions=cpus)

    # same JIT warm-up convention as bench.py
    QUERIES["cdc_lww_dedup"](spark, sf_dir).count()
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in names:
        q = QUERIES[name]
        if plan_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = q(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{plan_tag}.txt", "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        samples = []
        for d in range(draws):
            spark.sparkContext.setJobDescription(f"{name} draw {d}")
            t0 = time.time()
            df = q(spark, sf_dir)
            if sink == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples}
        print(f"{name}: best {min(samples):.2f}s of {samples}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "sink": sink, "queries": out}))


if __name__ == "__main__":
    main()
