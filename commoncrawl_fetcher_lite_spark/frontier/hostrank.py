"""Host-graph PageRank for crawl prioritization.

The north-star scheduler ranks frontier URLs by `recrawl score + host
token-bucket state`; real crawlers (and the OPIC/PageRank literature the
CC ranking files descend from — Common Crawl itself publishes harmonic-
centrality host ranks) add a HOST-GRAPH centrality term so link-endorsed
hosts are fetched first. The reference
(tballison/commoncrawl-fetcher-lite) has no graph stage — it fetches a
pre-ranked index — so this is §8 scope: the operator that produces the
rank its index was born with.

Scale shape (the iterative-join discipline of dedup_clusters'
pointer doubling, operators/dedup.py):

  * the edge list is deduped + self-loop-filtered ONCE and checkpointed;
    every iteration reuses the materialized frame — no re-derivation;
  * one iteration = ONE shuffle: contributions flow rank/out_degree
    along edges and partial aggregation (map-side combine) collapses a
    mega-host's 10^7 in-links before the exchange — in-degree skew never
    concentrates raw edge rows in one reducer;
  * the dangling-mass term (hosts with no out-links leak rank) is a
    one-row aggregate broadcast back — never a driver round-trip in the
    row path;
  * each iteration ends in an EAGER localCheckpoint: without it the
    lineage doubles per iteration and Catalyst re-analyzes a 2^k-deep
    plan (the classic iterative-DataFrame trap);
  * rank state is (host, double) — at 10^9 crawled hosts that is ~20 GB
    across the cluster, partitioned by host hash.

Determinism: fixed `n_iter` power iterations (no data-dependent stop),
pure arithmetic; the only float nondeterminism is shuffle summation
order, absorbed by the final 6-dp rounding (the repo-wide oracle
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.functions.joins import maybe_broadcast


def host_pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a (src_host, dst_host) edge list.

    Output: (host, rank[round 6]) for every host appearing as a source
    or destination. Uniform 1/N init; per iteration
    r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling_mass/N).
    """
    if n_iter < 1:
        raise ValueError("host_pagerank: n_iter must be >= 1")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one driver scalar (host count), like pick_n_buckets
    if n == 0:
        return nodes.select("host", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    d = float(damping)
    ranks = nodes.select("host", F.lit(1.0 / n).alias("r"))
    for it in range(n_iter):
        # rank state is ONE ROW PER HOST — orders of magnitude smaller
        # than the edge list. Joining it edge-side via a stats-gated
        # broadcast means the STATIC edge frame is never shuffled: the
        # per-edge share flows map-side, and the dst groupBy's partial
        # aggregation collapses each task's output to <= n_hosts rows
        # before the only exchange of the iteration. (Measured: the
        # r6 first-cut shuffled all edges per iteration and scaled at
        # 0.48-0.57; see BENCH/BASELINE.md W5.) At 10^9 hosts the gate
        # declines the hint and the join falls back to shuffle.
        outflow = maybe_broadcast(
            ranks.join(deg, ranks["host"] == deg["src"]).select(
                F.col("host"), (F.col("r") / F.col("deg")).alias("share")
            )
        )
        contrib = (
            e.join(outflow, e["src"] == outflow["host"])
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        dangling = ranks.join(deg, ranks["host"] == deg["src"], "left_anti").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contrib, nodes["host"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit((1.0 - d) / n)
                    + d * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("r"),
            )
        )
        # checkpoint every SECOND iteration (r7, guide §2.6/§5): the eager
        # materialization is this loop's serial spine — each one is a
        # driver-blocking job + a full write of the rank state. Plan depth
        # stays bounded at 2 iterations (Catalyst re-analysis cost is
        # O(depth^2) only past ~8-10 unrolled joins), the per-iteration
        # arithmetic is unchanged, and the job/barrier count halves —
        # locally that is half the fixed job latency, on a cluster half
        # the checkpoint-write barriers of the measured Amdahl spine.
        if it % 2 == 1 or it == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("host", F.round("r", 6).alias("rank"))
