"""spark-submit entrypoint (north rule: "runs via spark-submit --py-files
on N and 4N executor clusters").

    zip -r ccspark.zip commoncrawl_fetcher_lite_spark
    spark-submit --master <cluster> --py-files ccspark.zip \
        submit_job.py --query frontier_smoke --sf-dir /data/sf0.1 --out /out

The engine package arrives via --py-files (no install step); this script
only imports it and runs the requested plan. `--master` is whatever the
cluster offers — the engine has no local-mode assumptions (get_spark is a
test convenience, NOT used here; spark-submit owns the session).
"""

from __future__ import annotations

import argparse


def frontier_smoke(spark, sf_dir: str):
    """The flagship scheduling plan over a seeds frame derived from events
    (same shape as __spark_entry__.entry, parameterized by sf dir)."""
    from pyspark.sql import functions as F

    from commoncrawl_fetcher_lite_spark.frontier.politeness import schedule_batch
    from commoncrawl_fetcher_lite_spark.frontier.urlseen import (
        filter_unseen,
        with_url_hash,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    seeds = ev.select(
        F.concat(
            F.lit("https://host"),
            (F.col("user_id") % 20).cast("string"),
            F.lit(".example.com/e/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("host"), (F.col("user_id") % 20).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.col("value").alias("priority"),
        F.lit(0.0).alias("recrawl_score"),
        "event_id",
    )
    seen = with_url_hash(seeds.where(F.col("event_id") % 7 == 0).select("url"))
    unseen = filter_unseen(seeds, seen)
    quotas = spark.createDataFrame([], "host string, quota int")
    return schedule_batch(unseen, quotas, default_quota=25, n_salt=4).select(
        "url", "host", "host_rank", "effective_priority"
    )


QUERIES = {"frontier_smoke": frontier_smoke}


def main() -> None:
    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True, choices=sorted(QUERIES))
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"ccspark-{args.query}").getOrCreate()
    df = QUERIES[args.query](spark, args.sf_dir)
    df.write.mode("overwrite").parquet(args.out)
    print(f"rows={spark.read.parquet(args.out).count()}")
    spark.stop()


if __name__ == "__main__":
    main()
