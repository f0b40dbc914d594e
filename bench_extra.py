"""Extra benchmark harness for optimization work (guide §1).

NOT the driver contract — bench.py is frozen and stays the measured
artifact. This tool exists to isolate per-query cost with the noop sink,
capture .explain("formatted") plans, and time subsets of queries quickly
while iterating.

Usage:
  python bench_extra.py --queries minhash_lsh,dedup_clusters --reps 3
  python bench_extra.py --all --reps 1 --explain-dir plans/r07 --suffix _before
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py --queries corpus_clean

Prints one JSON line per query: {"query": ..., "samples": [...], "min": ..., "median": ...}
and a final total line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from commoncrawl_fetcher_lite_spark.session import get_spark

    import bench as benchmod
    import __spark_entry__ as entrymod

    spark = get_spark(
        "bench_extra", cores=args.cpus, shuffle_partitions=args.cpus, tmpfs_local_dir=True
    )
    qs = entrymod.queries()
    qs["frontier_schedule"] = benchmod.frontier_schedule_query
    qs["frontier_schedule_compact"] = benchmod.frontier_schedule_compact_query

    if args.all:
        names = list(benchmod.BENCH_QUERIES)
    else:
        names = [n for n in args.queries.split(",") if n]
    sf_dir = args.sf_dir

    # warm the JVM + parquet footers once (same as bench.py)
    for t in ("events", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    totals = {}
    for name in names:
        fn = qs[name]
        if args.explain_dir:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if args.explain_only:
            continue
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        totals[name] = min(samples)
        print(
            json.dumps(
                {
                    "query": name,
                    "samples": samples,
                    "min": min(samples),
                    "median": round(_median(samples), 4),
                }
            ),
            flush=True,
        )
    if totals:
        print(json.dumps({"total_min": round(sum(totals.values()), 4), "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
