"""Stateful streaming politeness (applyInPandasWithState token bucket):
cross-micro-batch state must reproduce the batch loop's refill/debit rule."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.streaming.host_state import (
    stateful_host_quota,
)

SCHEMA = "url string, host string, priority double"


def _write_seed_file(path, urls):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "url": [u for u, _, _ in urls],
            "host": [h for _, h, _ in urls],
            "priority": [p for _, _, p in urls],
        }
    )
    pq.write_table(tbl, path)


def test_stateful_host_quota_debits_across_microbatches(spark, tmp_path):
    seeds_dir = str(tmp_path / "seeds")
    os.makedirs(seeds_dir)
    # file A: 5 candidates for h1; file B (arrives later): 5 more
    a = [(f"https://h1.example.com/a/{i}", "h1.example.com", float(9 - i)) for i in range(5)]
    b = [(f"https://h1.example.com/b/{i}", "h1.example.com", float(9 - i)) for i in range(5)]
    _write_seed_file(f"{seeds_dir}/a.parquet", a)
    time.sleep(1.1)  # distinct mtimes → deterministic micro-batch order
    _write_seed_file(f"{seeds_dir}/b.parquet", b)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seeds_dir)
    )
    # burst=2, rate=0.1, dt=10 → batch1 avail 3 → quota 3, drains to 0;
    # batch2 avail min(3, 0+1)=1 → quota 1
    out = stateful_host_quota(
        stream, batch_seconds=10.0, tokens_per_sec=0.1, burst=2, max_per_batch=5
    )
    batches: list[list] = []

    def handle(df, batch_id):
        batches.append(sorted((r["url"], r["host_rank"]) for r in df.collect()))

    q = (
        out.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    nonempty = [b for b in batches if b]
    assert len(nonempty) == 2
    # batch 1: top-3 of file A by (priority desc, url asc)
    assert nonempty[0] == [
        ("https://h1.example.com/a/0", 1),
        ("https://h1.example.com/a/1", 2),
        ("https://h1.example.com/a/2", 3),
    ]
    # batch 2: bucket drained → quota 1 → only the best of file B
    assert nonempty[1] == [("https://h1.example.com/b/0", 1)]


def test_stateful_quota_matches_batch_rule(spark, tmp_path):
    """The streaming operator's emission counts equal the batch engine's
    refill/debit rule applied sequentially to the same two waves."""
    from commoncrawl_fetcher_lite_spark.frontier.politeness import (
        debit_tokens,
        refill_tokens,
    )

    hosts = spark.createDataFrame([("h1.example.com",)], "host string")
    r1 = refill_tokens(None, hosts, 10.0, 0.1, 2, 5)
    q1 = r1.collect()[0]["quota"]
    sched1 = spark.createDataFrame(
        [("h1.example.com",)] * q1, "host string"
    )
    s1 = debit_tokens(r1, sched1)
    r2 = refill_tokens(s1, hosts, 10.0, 0.1, 2, 5)
    q2 = r2.collect()[0]["quota"]
    assert (q1, q2) == (3, 1)  # same numbers the streaming test asserts


def test_stateful_hot_host_running_topk(spark, tmp_path):
    """A hot host whose micro-batch arrives as MANY Arrow chunks must emit
    exactly the global top-quota (the running-top-k across the chunk
    iterator equals one full sort), keeping per-chunk memory ≈ quota +
    chunk instead of buffering the whole candidate set."""
    n = 25_000  # > default spark.sql.execution.arrow.maxRecordsPerBatch
    urls = [
        (f"https://hot.example.com/u/{i:06d}", "hot.example.com", float(i % 997))
        for i in range(n)
    ]
    seeds_dir = str(tmp_path / "seeds")
    os.makedirs(seeds_dir)
    _write_seed_file(f"{seeds_dir}/a.parquet", urls)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seeds_dir)
    )
    out = stateful_host_quota(
        stream, batch_seconds=10.0, tokens_per_sec=1.0, burst=10, max_per_batch=7
    )
    got: list[tuple] = []

    def handle(df, batch_id):
        got.extend((r["url"], r["host_rank"]) for r in df.collect())

    q = (
        out.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expected = sorted(urls, key=lambda t: (-t[2], t[0]))[:7]
    assert sorted(got, key=lambda t: t[1]) == [
        (u, i + 1) for i, (u, _, _) in enumerate(expected)
    ]
