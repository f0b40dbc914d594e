"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

Each query is fully materialized via the noop sink (no driver collect).
Set BENCH_CPUS to override parallelism (used by scaling_bench.py for the
N-vs-4N efficiency protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("BENCH_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "32")))
# REPS=5 + median reporting (VERDICT r3 finding #1): min-of-3 could not
# distinguish this box's temporal tenant noise (2-10x swings on identical
# code) from a real regression; the median over 5 is the comparison
# number, the min approximates the uncontended floor.
REPS = int(os.environ.get("BENCH_REPS", "5"))

BENCH_QUERIES = [
    "mime_count",
    "selector",
    "budget_prefix",
    "top_report",
    "host_quota",
    "urlseen_antijoin",
    "dedup_exact",
    "token_count",
    "quality_score",
    "pricing_summary",
    "join_revenue",
    "region_revenue",
    "sessionize",
    "knn_cosine",
    "lang_breakdown",
    "robots_filter",
    "robots_wildcards",
    "urlseen_blocked",
    "media_classify",
    "recrawl_priority",
    "decontaminate",
    "minhash_lsh",
    "dedup_clusters",
    "corpus_clean",
    "simhash_neardup",
    "lsh_ann",
    "ivf_ann",
    # embedding_neardup_lsh is correctness-gated at sf0.01 but excluded
    # here: its driver-query config targets the fixture's cos-0.4 regime,
    # where hyperplane collision probabilities (0.63 true vs 0.50 random
    # per bit) barely separate and candidate generation degenerates toward
    # all-pairs — the real sweep regime is c>=0.9 / n_planes>=8, which the
    # fixture has no pairs to exercise.
    "fingerprint",
    "lang_id",
    "bpe_token_count",
    "frontier_schedule",
    "frontier_schedule_compact",
    # the full two-iteration scheduler loop through a real SnapshotStore
    # (robots -> seen -> token bucket -> top-k -> MoR commit), timed
    # end-to-end including the snapshot writes
    "crawl_iteration",
    # scan-side text-prep additions (pure Catalyst, map-only)
    "gopher_quality",
    "html_extract",
    "pii_scrub",
    "link_extract",
    # training-shard prep: passage-level dedup + distributed prefix-sum
    # sequence packing
    "duplicate_spans",
    "pack_sequences",
    "shard_manifest",
    "line_dedup",
    "unigram_logprob",
    "corpus_stats",
    # stateful Structured-Streaming dedup ledger drained via AvailableNow
    "streaming_dedup",
    # Gopher repetition gates (map-only sorted-gram folds)
    "repetition_signals",
    # deterministic mixing / global shard shuffle / SemDeDup
    "mix_corpus",
    "shard_shuffle",
    "semdedup",
    # corpus-prep batch 2: keywords, normalization, holdout, blocklist
    "tfidf_topk",
    "normalize_text",
    "holdout_split",
    "blocklist",
    # product-quantized ANN (m-byte codes + ADC lookup tables)
    "ivfpq_ann",
    # overlapping context-window chunking (map-only explode)
    "chunk_documents",
    # in-scan gopher gate + survivor tf-idf (the W4 scaling workload)
    "corpus_prep",
    # sitemap discovery from robots.txt (third seed channel)
    "sitemaps",
    # exact-count stratified eval carve-out (WindowGroupLimit top-k)
    "sample_exact",
    # watermarked windowed per-host rate, drained via AvailableNow
    "streaming_host_metrics",
    # robots Crawl-delay -> token-rate cap
    "crawl_delay_quota",
    # per-host failure backoff (multiplicative increase/decrease)
    "host_backoff",
    # full loop: blocklist gate + backoff halving + outlink discovery,
    # two snapshot-committed iterations (r6)
    "crawl_iteration_full",
    # per-stratum token-budget mix (distributed prefix sum per stratum)
    "token_budget_mix",
    # north-rule interleaved spans: sort/reassemble/stats, pure HOFs
    "span_assembly",
    # chunk->doc embedding mean-pool (64 scalar aggs, map-side combine)
    "mean_pool",
    # DSIR importance resampling: hashed n-gram buckets, broadcast
    # log-ratio table, Gumbel top-k (r6)
    "dsir_select",
    # batch-vs-state LSH dedup: O(batch) against a persisted corpus (r6)
    "incremental_neardup",
    # host-graph PageRank: 10 checkpointed power iterations (r6)
    "host_pagerank",
    # Cho-Garcia-Molina change-rate estimator from fetch history (r6)
    "change_rate",
    # jusText-lite block classification: map-only regexp/HOF chain (r6)
    "boilerplate",
    # graded benchmark-overlap fractions (r6)
    "contamination_report",
    # sitemap XML -> per-URL recrawl-rate priors (r6)
    "sitemap_entries",
]


# fan-out factor for the frontier bench: 100k events at sf0.1 → 2M URLs,
# large enough that per-job fixed stage overhead (~0.5-1 s) stops dominating
# the urls/sec number (round-1's 100k-URL run measured mostly overhead and
# disagreed 150x with scaling_bench's 4M-URL rate — same operator, tiny input)
FRONTIER_FANOUT = 20


def frontier_schedule_query(spark, sf_dir):
    """The crawl flagship at bench scale: seen-filter + politeness schedule
    over a seeds frame derived from events, fanned out FRONTIER_FANOUT× so
    the throughput measurement reflects engine work, not stage overhead."""
    from pyspark.sql import functions as F

    from commoncrawl_fetcher_lite_spark.frontier.politeness import schedule_batch
    from commoncrawl_fetcher_lite_spark.frontier.urlseen import (
        filter_unseen,
        with_url_hash,
    )

    # events.parquet is a single file → 1-2 scan partitions; without a
    # spread the 20x fanout + canonicalize + hash would run on <=2 cores
    # until the first shuffle (at 100 TB the scan has thousands of files
    # and this repartition is unnecessary — bench-scale artifact only)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    fanned = ev.select(
        "event_id", "user_id", "value",
        F.explode(F.sequence(F.lit(0), F.lit(FRONTIER_FANOUT - 1))).alias("rep"),
    )
    seeds = fanned.select(
        F.concat(
            F.lit("https://host"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".example.com/e/"),
            F.col("event_id").cast("string"),
            F.lit("/r/"),
            F.col("rep").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("host"), (F.col("user_id") % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.col("value").alias("priority"),
        F.lit(0.0).alias("recrawl_score"),
        "event_id",
    )
    seen = with_url_hash(seeds.where(F.col("event_id") % 7 == 0).select("url"))
    unseen = filter_unseen(seeds, seen)
    quotas = spark.createDataFrame([], "host string, quota int")
    # broadcast=True: the quota dim is empty/tiny by construction here but
    # createDataFrame has no Catalyst stats, so the auto gate would plan a
    # sort-merge that shuffles+sorts the 2M-row candidate side (measured
    # 11x slower); the real loop's store-backed quotas gate automatically
    return schedule_batch(
        unseen, quotas, default_quota=200, n_salt=8, broadcast=True
    )


def frontier_schedule_compact_query(spark, sf_dir):
    """The same flagship through the shuffle-byte diet (frontier/diet.py):
    anti-join + windows on the 24 B (url_hash, host_id, _prio) frame, url/
    host payload re-joined once after the final top-k (AQE broadcasts the
    quota-bounded batch). Same inputs as frontier_schedule; the delta is
    shuffle bytes."""
    from pyspark.sql import functions as F

    from commoncrawl_fetcher_lite_spark.frontier.diet import (
        schedule_frontier_compact,
    )
    from commoncrawl_fetcher_lite_spark.frontier.urlseen import with_url_hash

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    fanned = ev.select(
        "event_id", "user_id", "value",
        F.explode(F.sequence(F.lit(0), F.lit(FRONTIER_FANOUT - 1))).alias("rep"),
    )
    seeds = fanned.select(
        F.concat(
            F.lit("https://host"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".example.com/e/"),
            F.col("event_id").cast("string"),
            F.lit("/r/"),
            F.col("rep").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("host"), (F.col("user_id") % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.col("value").alias("priority"),
        F.lit(0.0).alias("recrawl_score"),
        "event_id",
    )
    seen = with_url_hash(seeds.where(F.col("event_id") % 7 == 0).select("url"))
    return schedule_frontier_compact(
        seeds, seen, host_quotas=None, default_quota=200, n_salt=8
    )


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    from commoncrawl_fetcher_lite_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        "bench", cores=CPUS, shuffle_partitions=CPUS, tmpfs_local_dir=True
    )
    qs = entrymod.queries()
    qs["frontier_schedule"] = frontier_schedule_query
    qs["frontier_schedule_compact"] = frontier_schedule_compact_query

    # warm the JVM + parquet footers once
    for t in ("events", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    # min + median over REPS: the min approximates the uncontended floor;
    # the MEDIAN is the round-over-round comparison number (this box's
    # tenant noise swings identical code 2-10x, so min-of-few could not
    # separate noise from regression — VERDICT r3 finding #1).
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in BENCH_QUERIES:
        fn = qs[name]
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        medians[name] = round(_median(samples), 4)
    total = round(sum(timings.values()), 4)
    total_median = round(sum(medians.values()), 4)
    wall = round(time.perf_counter() - t_all, 4)

    # throughput: URLs through the frontier (hash + seen anti-join + salted
    # politeness top-k) per sec — the north-rule metric shape
    ev_rows = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    n_urls = ev_rows * FRONTIER_FANOUT
    sched_per_sec = round(n_urls / timings["frontier_schedule"], 1)
    diet_per_sec = round(n_urls / timings["frontier_schedule_compact"], 1)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "total_median": total_median,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "cpus": CPUS,
                "reps": REPS,
                "wall_sec": wall,
                "frontier_urls": n_urls,
                "frontier_urls_per_sec": sched_per_sec,
                "frontier_diet_urls_per_sec": diet_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
