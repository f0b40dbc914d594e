"""Host-graph PageRank (frontier/hostrank.py) vs a dense numpy power
iteration — independent implementation, same fixed-iteration semantics."""

from __future__ import annotations

import numpy as np
import pytest

from commoncrawl_fetcher_lite_spark.frontier.hostrank import host_pagerank


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    edges = sorted(set((s, t) for s, t in edges if s != t))
    hosts = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {h: round(float(r[idx[h]]), 6) for h in hosts}


@pytest.fixture(scope="module")
def chain_edges():
    # a ring + a hub + a dangling sink: a→b→c→a, hub→{a,b,c,sink}
    return [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "sink"),
    ]


def test_pagerank_matches_numpy_reference(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src string, dst string")
    got = {r["host"]: r["rank"] for r in host_pagerank(df, n_iter=10).collect()}
    want = _numpy_pagerank(chain_edges, n_iter=10)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=2e-6)


def test_pagerank_mass_conserved_and_sink_fed(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src string, dst string")
    rows = host_pagerank(df, n_iter=10).collect()
    total = sum(r["rank"] for r in rows)
    # dangling-mass redistribution keeps ||r||_1 = 1
    assert total == pytest.approx(1.0, abs=1e-4)
    ranks = {r["host"]: r["rank"] for r in rows}
    # the sink receives rank; the hub (no in-links) bottoms out
    assert ranks["sink"] > ranks["hub"]


def test_pagerank_dedupes_edges_and_drops_self_loops(spark):
    noisy = [("a", "b")] * 5 + [("a", "a"), ("b", "a")]
    df = spark.createDataFrame(noisy, "src string, dst string")
    got = {r["host"]: r["rank"] for r in host_pagerank(df, n_iter=5).collect()}
    want = _numpy_pagerank([("a", "b"), ("b", "a")], n_iter=5)
    assert got == pytest.approx(want, abs=2e-6)


def test_pagerank_partitioning_invariant(spark, chain_edges):
    df = spark.createDataFrame(chain_edges, "src string, dst string")
    a = {r["host"]: r["rank"] for r in host_pagerank(df, n_iter=6).collect()}
    b = {
        r["host"]: r["rank"]
        for r in host_pagerank(df.repartition(7), n_iter=6).collect()
    }
    assert a == b


def test_pagerank_checkpoint_cadence_invariant(spark, chain_edges):
    """r7: ranks checkpoint every SECOND iteration (plus the final one).
    Every cadence branch must produce reference values — n_iter=1 (final-
    only), n_iter=3 (one mid + final on an even index), n_iter=4 (final
    lands on a cadence checkpoint) — i.e. the materialization schedule is
    performance-only and never leaks into the arithmetic."""
    df = spark.createDataFrame(chain_edges, "src string, dst string")
    for n_iter in (1, 3, 4):
        got = {
            r["host"]: r["rank"]
            for r in host_pagerank(df, n_iter=n_iter).collect()
        }
        want = _numpy_pagerank(chain_edges, n_iter=n_iter)
        assert got == pytest.approx(want, abs=2e-6), n_iter


def test_pagerank_rejects_bad_iter(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        host_pagerank(df, n_iter=0)


def test_host_rank_prior_steers_the_scheduler(spark, tmp_path):
    """A host_rank table committed at bootstrap boosts candidate priority
    (priority + weight*rank), so under a global budget the link-endorsed
    host's URLs are scheduled first; without the table the ordering
    falls back to base priority. The table carries forward across
    iterations like robots/blocklist."""
    from commoncrawl_fetcher_lite_spark.config import FrontierConfig
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import (
        SnapshotStore,
    )
    from commoncrawl_fetcher_lite_spark.frontier.scheduler import (
        bootstrap,
        run_iteration,
    )
    from pyspark.sql import functions as F

    # two hosts, equal base priority; 'ranked.com' gets centrality 0.5
    seeds = spark.createDataFrame(
        [
            (f"https://{h}/p{i}", h, 0.1, 0.0)
            for h in ("plain.com", "ranked.com")
            for i in range(4)
        ],
        "url string, host string, priority double, recrawl_score double",
    )
    ranks = spark.createDataFrame(
        [("ranked.com", 0.5)], "host string, rank double"
    )
    cfg = FrontierConfig(n_salt=2, default_max_per_batch=2, default_burst=2)

    # the committed batch table is deliberately skinny (url_hash, url);
    # effective_priority — the global crawl-order key the prior exists
    # to shift — is observed on the batch handed to fetch_fn
    seen_prios: list[dict] = []

    def capture(batch):
        seen_prios.append(
            {
                r["host"]: r["p"]
                for r in batch.groupBy("host")
                .agg(F.max("effective_priority").alias("p"))
                .collect()
            }
        )
        return batch

    store = SnapshotStore(str(tmp_path / "ranked"), spark)
    bootstrap(store, seeds, host_rank=ranks)
    run_iteration(store, cfg, fetch_fn=capture)
    # both hosts get their per-host quota, but the ranked host's
    # effective priority carries the +0.5 boost → it leads crawl order
    assert seen_prios[0]["ranked.com"] == pytest.approx(0.6)
    assert seen_prios[0]["plain.com"] == pytest.approx(0.1)
    # the table carried forward: iteration 2 still sees the boost
    run_iteration(store, cfg, fetch_fn=capture)
    assert seen_prios[1]["ranked.com"] == pytest.approx(0.6)

    # control: no host_rank table → base priorities only
    store2 = SnapshotStore(str(tmp_path / "plain"), spark)
    bootstrap(store2, seeds)
    run_iteration(store2, cfg, fetch_fn=capture)
    assert seen_prios[2]["ranked.com"] == pytest.approx(0.1)
