"""Backoff fetcher ladder, observe() counters, CSV log export, crawl-delay
quota capping."""

from __future__ import annotations

import glob
import os

import pytest

from commoncrawl_fetcher_lite_spark.config import ExtractorConfig
from commoncrawl_fetcher_lite_spark.fixtures import warc_local_path
from commoncrawl_fetcher_lite_spark.plans.csv_logs import export_csv_logs
from commoncrawl_fetcher_lite_spark.plans.fetch_pipeline import run_fetch
from commoncrawl_fetcher_lite_spark.sources.fetcher import (
    BackoffFetcher,
    ThrottleException,
    local_fs_transport,
)

SELECTOR = {"must": {"status": [{"match": "200"}]}}


class Flaky:
    def __init__(self, fail_times: int, status: int = 503):
        self.n = fail_times
        self.status = status
        self.calls = 0

    def __call__(self, key, start, end):
        self.calls += 1
        if self.calls <= self.n:
            e = Exception(f"bad status code: {self.status}")
            raise e
        return b"payload-" + key.encode()


def test_backoff_ladder_retries_then_succeeds():
    sleeps = []
    f = BackoffFetcher(
        transport=Flaky(2), throttle_seconds=(1, 2, 4), sleeper=sleeps.append
    )
    out = f.fetch("crawl-data/x.warc.gz", 0, 10)
    assert out.startswith(b"payload-https://data.commoncrawl.org/crawl-data/")
    assert sleeps == [1, 2]  # ladder order (BackoffHttpFetcher.java:74-107)


def test_backoff_ladder_exhausts():
    sleeps = []
    f = BackoffFetcher(
        transport=Flaky(10), throttle_seconds=(1, 2), sleeper=sleeps.append
    )
    with pytest.raises(ThrottleException):
        f.fetch("k")
    assert sleeps == [1, 2]


def test_non_throttle_error_raises_immediately():
    sleeps = []
    f = BackoffFetcher(
        transport=Flaky(1, status=404), throttle_seconds=(1,), sleeper=sleeps.append
    )
    with pytest.raises(Exception, match="404"):
        f.fetch("k")
    assert sleeps == []


def test_url_base_prefixing():
    f = BackoffFetcher(transport=lambda k, s, e: k.encode())
    assert f.fetch("rel/path") == b"https://data.commoncrawl.org/rel/path"
    assert f.fetch("https://x/y") == b"https://x/y"
    assert f.fetch("/abs/path") == b"/abs/path"


def test_local_fs_transport_range(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"0123456789")
    t = local_fs_transport(lambda k: str(p))
    assert t("k", 2, 5) == b"2345"  # inclusive range like HTTP bytes=2-5
    assert t("k", None, None) == b"0123456789"


def test_observe_metrics_and_csv_logs(spark, fixture_t1, tmp_path):
    fx = fixture_t1
    cfg = ExtractorConfig(index_paths=(fx.paths_gz,), selector=SELECTOR)
    res = run_fetch(spark, cfg, path_resolver=lambda f: warc_local_path(fx.root, f))
    export_csv_logs(res, str(tmp_path / "logs"))

    obs = res.metrics["observation"]
    got = obs.get  # filled by the export action
    assert got["fetchable_records"] > 0
    assert got["empty_payload"] >= 0 and got["digest_mismatch"] >= 0
    # empty-payload and read-error rows were excluded from extracted
    assert res.extracted.count() == (
        got["fetchable_records"] - got["empty_payload"] - got["read_errors"]
    )

    files = glob.glob(str(tmp_path / "logs/extracted-urls/*.csv"))
    assert files
    header = open(files[0]).readline().strip()
    assert header == (
        "url,mime,mime_detected,warc_file,warc_offset,warc_length,"
        "sha256,length,path"
    )
    full = glob.glob(str(tmp_path / "logs/urls-truncated-full/*.csv"))
    assert open(full[0]).readline().strip() == (
        "url,mime,mime_detected,warc_file,warc_offset,warc_length,truncated"
    )


def test_crawl_delay_caps_quota(spark):
    from commoncrawl_fetcher_lite_spark.frontier.politeness import host_quota

    hb = spark.createDataFrame(
        [("*", 1.0, 10, 100), ("slow.com", 5.0, 0, 100), ("fast.com", 5.0, 0, 100)],
        "host string, tokens_per_sec double, burst int, max_per_batch int",
    )
    robots = spark.createDataFrame(
        [("slow.com", [], 10.0)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double",
    )
    quotas, default_q = host_quota(hb, batch_seconds=60.0, robots=robots)
    q = {r["host"]: r["quota"] for r in quotas.collect()}
    assert q["fast.com"] == 100  # min(100, 0 + 5*60)
    assert q["slow.com"] == 6  # crawl_delay 10s → 0.1 tok/s → 6 per 60s
    assert default_q == 70  # 10 + 1*60


def test_fetch_stage_concurrency_cap(spark, fixture_t1):
    """T3: numThreads caps the fetch STAGE's task count (the engine analog
    of the reference's worker-thread cap, ExtractorConfig.java:50) without
    narrowing the upstream scan/parse — the repartition barrier means at
    most numThreads concurrent transport connections."""
    from pyspark.sql import functions as F

    fx = fixture_t1
    for n in (2, 3):
        cfg = ExtractorConfig(
            index_paths=(fx.paths_gz,),
            selector=SELECTOR,
            num_threads=n,
        )
        res = run_fetch(
            spark, cfg, path_resolver=lambda f: warc_local_path(fx.root, f)
        )
        parts = (
            res.extracted.select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert parts <= n, f"fetch ran in {parts} tasks with numThreads={n}"


def test_numthreads_cap_only_when_explicit(spark, fixture_t1):
    """numThreads resolution (ADVICE r3 + r4): absent numThreads must NOT
    throttle a cluster-scaling transport (S3/fs/explicit resolver) — but
    for the HTTP origin an absent value keeps the reference's courtesy cap
    of 2 (ExtractorConfig.java:50), so existing reference configs produce
    the same external load they always did; explicit 0 opts HTTP out.
    When the cap IS set, same-file records stay in one task (filename-hash
    repartition, preserving the per-task WARC handle cache)."""
    from pyspark.sql import functions as F

    from commoncrawl_fetcher_lite_spark.config import (
        effective_fetch_cap,
        from_json_dict,
    )

    absent = from_json_dict({"indices": {"paths": []}})
    assert absent.num_threads == -1
    assert effective_fetch_cap(absent, transport_is_http=True) == 2
    assert effective_fetch_cap(absent, transport_is_http=False) is None
    explicit0 = from_json_dict({"indices": {"paths": []}, "numThreads": 0})
    assert effective_fetch_cap(explicit0, transport_is_http=True) is None
    explicit3 = from_json_dict({"indices": {"paths": []}, "numThreads": 3})
    assert explicit3.num_threads == 3
    assert effective_fetch_cap(explicit3, transport_is_http=False) == 3

    fx = fixture_t1
    cfg = ExtractorConfig(
        index_paths=(fx.paths_gz,), selector=SELECTOR, num_threads=2
    )
    res = run_fetch(spark, cfg, path_resolver=lambda f: warc_local_path(fx.root, f))
    per_file = (
        res.extracted.select("warc_file", F.spark_partition_id().alias("p"))
        .groupBy("warc_file")
        .agg(F.countDistinct("p").alias("nparts"))
        .collect()
    )
    assert per_file, "no extracted rows"
    for r in per_file:
        assert r["nparts"] == 1, (
            f"{r['warc_file']} split across {r['nparts']} tasks under the cap"
        )


def test_fetch_task_deadline(spark, fixture_t1):
    """T4 (CCFileExtractor.java:150-153 queue-poll timeout): past the
    per-task deadline remaining records are NOT fetched — they surface as
    read_error='deadline_exceeded' rows counted by observe(), and the
    extracted branch drops them."""
    fx = fixture_t1
    cfg = ExtractorConfig(
        index_paths=(fx.paths_gz,),
        selector=SELECTOR,
        fetch_deadline_seconds=0.0,
    )
    res = run_fetch(spark, cfg, path_resolver=lambda f: warc_local_path(fx.root, f))
    assert res.extracted.count() == 0
    m = res.metrics["observation"].get
    assert m["read_errors"] == m["fetchable_records"] > 0

    # generous deadline: nothing marked (the default-path regression guard)
    cfg2 = ExtractorConfig(index_paths=(fx.paths_gz,), selector=SELECTOR)
    res2 = run_fetch(spark, cfg2, path_resolver=lambda f: warc_local_path(fx.root, f))
    n = res2.extracted.count()
    assert n > 0
    assert res2.metrics["observation"].get["read_errors"] == 0
