"""Deterministic corpus mixing + shard shuffle (operators/mixing.py) and
the SemDeDup operator (operators/similarity.semdedup).

The mixing contract: the SAME corpus mixed twice — or mixed with a
different input partitioning — yields the IDENTICAL multiset of copies
(the whole point of replacing unseeded random sampling, same rationale as
functions/sampling.sample_gate vs the reference's unseeded
java.util.Random, selector/AbstractSamplingSelector.java:40-55).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.operators.mixing import mix_corpus, shard_shuffle


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_mix_rate_zero_drops_stratum(docs):
    out = mix_corpus(docs, {"en": 0.0}, default_rate=1.0)
    assert out.where("lang = 'en'").count() == 0
    # other strata untouched: exactly one copy each
    assert out.where("lang != 'en'").count() == docs.where("lang != 'en'").count()


def test_mix_integer_rate_exact_copies(docs):
    out = mix_corpus(docs, {"de": 3.0}, default_rate=1.0)
    de = docs.where("lang = 'de'").count()
    assert out.where("lang = 'de'").count() == 3 * de
    idx = (
        out.where("lang = 'de'")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("copy_idx")).alias("c"))
        .select("c")
        .distinct()
        .collect()
    )
    assert [r["c"] for r in idx] == [[0, 1, 2]]


def test_mix_fractional_rate_is_deterministic_and_plausible(docs):
    a = mix_corpus(docs, {"fr": 0.5}, default_rate=1.0)
    b = mix_corpus(docs.repartition(7), {"fr": 0.5}, default_rate=1.0)
    ra = sorted((r.doc_id, r.copy_idx) for r in a.collect())
    rb = sorted((r.doc_id, r.copy_idx) for r in b.collect())
    assert ra == rb  # partitioning-independent
    fr_total = docs.where("lang = 'fr'").count()
    fr_kept = a.where("lang = 'fr'").count()
    assert 0.3 * fr_total < fr_kept < 0.7 * fr_total  # ~half, seeded


def test_mix_seed_changes_selection(docs):
    a = {r.doc_id for r in mix_corpus(docs, {"fr": 0.5}, seed=1).where("lang='fr'").collect()}
    b = {r.doc_id for r in mix_corpus(docs, {"fr": 0.5}, seed=2).where("lang='fr'").collect()}
    assert a != b


def test_mix_is_map_only(docs):
    plan = _plan(mix_corpus(docs, {"en": 2.5}))
    assert "Exchange" not in plan


def test_mix_rejects_negative_rate(docs):
    with pytest.raises(ValueError):
        mix_corpus(docs, {"en": -1.0})


def test_shard_shuffle_partition_of_corpus(docs):
    out = shard_shuffle(docs, n_shards=8)
    assert out.count() == 400
    assert out.select("doc_id").distinct().count() == 400
    # positions are a contiguous 0..k-1 run within every shard
    bad = (
        out.groupBy("shard_id")
        .agg(F.count("*").alias("k"), F.max("pos_in_shard").alias("mx"),
             F.min("pos_in_shard").alias("mn"),
             F.countDistinct("pos_in_shard").alias("d"))
        .where("mx != k - 1 OR mn != 0 OR d != k")
        .count()
    )
    assert bad == 0
    # pseudo-random balance: no shard is empty or dominant
    sizes = [r.k for r in out.groupBy("shard_id").agg(F.count("*").alias("k")).collect()]
    assert len(sizes) == 8 and min(sizes) > 10 and max(sizes) < 150


def test_shard_shuffle_deterministic_and_reordering(docs):
    a = sorted(map(tuple, shard_shuffle(docs, 4).collect()))
    b = sorted(map(tuple, shard_shuffle(docs.repartition(5), 4).collect()))
    assert a == b
    # within a shard the order is NOT id order (it is a shuffle)
    first = shard_shuffle(docs, 4).where("shard_id = 0").orderBy("pos_in_shard")
    ids = [r.doc_id for r in first.collect()]
    assert ids != sorted(ids)


def test_shard_shuffle_no_single_partition_exchange(docs):
    plan = _plan(shard_shuffle(docs, 16))
    assert "Exchange SinglePartition" not in plan


# ------------------------------------------------------------- semdedup


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_semdedup_collapses_exact_duplicates(spark):
    # 2 is a duplicate of 0; 3 of 1; 4 unique. n_cells=2 → centroids are
    # vec 0 and vec 1; duplicates land in their twin's cell by nearest-
    # centroid assignment.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [1.0, 0.001, 0.0]),
        (3, [0.0, 1.0, 0.001]),
        (4, [0.577, 0.577, 0.577]),
    ]
    out = {r.vec_id: r for r in semdedup_rows(spark, rows, tau=0.99, n_cells=2)}
    assert out[2].cluster_id == 0 and not out[2].kept
    assert out[3].cluster_id == 1 and not out[3].kept
    assert out[0].kept and out[1].kept and out[4].kept


def semdedup_rows(spark, rows, **kw):
    from commoncrawl_fetcher_lite_spark.operators.similarity import semdedup

    return semdedup(_emb(spark, rows), **kw).collect()


def test_semdedup_transitive_within_cell(spark):
    # chain 0~1~2 (adjacent cosines above tau, 0 vs 2 below): one component
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.98, 0.199]),
        (2, [0.921, 0.3897]),
        (3, [0.0, 1.0]),
    ]
    out = {r.vec_id: r for r in semdedup_rows(spark, rows, tau=0.97, n_cells=1)}
    assert out[0].cluster_id == out[1].cluster_id == out[2].cluster_id == 0
    assert out[0].kept and not out[1].kept and not out[2].kept
    assert out[3].kept


def test_semdedup_cross_cell_pairs_not_compared(spark):
    # vec 2 is identical to vec 1 but sits nearest centroid 0 is false —
    # craft it so 1 and 2 land in DIFFERENT cells: the pair is never
    # compared (SemDeDup's documented recall loss), both are kept.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.708, 0.706]),   # cell 0 (barely)
        (3, [0.706, 0.708]),   # cell 1 (barely) — near-identical to 2
    ]
    out = {r.vec_id: r for r in semdedup_rows(spark, rows, tau=0.9, n_cells=2)}
    assert out[2].cell != out[3].cell
    assert out[2].kept and out[3].kept


def test_semdedup_deterministic_across_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    a = sorted(map(tuple, semdedup_rows(spark, rows, tau=0.6, n_cells=4)))
    from commoncrawl_fetcher_lite_spark.operators.similarity import semdedup

    b = sorted(
        map(tuple, semdedup(_emb(spark, rows).repartition(9), tau=0.6, n_cells=4).collect())
    )
    assert a == b


# ---------------------------------------------------------- sample_exact


def test_sample_exact_counts_and_determinism(docs):
    from commoncrawl_fetcher_lite_spark.operators.mixing import sample_exact

    out = sample_exact(docs, k=30, stratum_col="lang")
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts == {"en": 30, "de": 30, "fr": 30}
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, sample_exact(docs.repartition(7), k=30, stratum_col="lang").collect()))
    assert a == b
    # ranks are a contiguous 1..k run per stratum
    assert out.where("sample_rank < 1 OR sample_rank > 30").count() == 0
    assert out.select("lang", "sample_rank").distinct().count() == 90


def test_sample_exact_membership_stable_under_growth(docs):
    """Growing a stratum only displaces rows at the selection boundary."""
    from commoncrawl_fetcher_lite_spark.operators.mixing import sample_exact

    small = sample_exact(docs.where("doc_id < 200"), k=10, stratum_col="lang")
    big = sample_exact(docs, k=10, stratum_col="lang")
    s = {r.doc_id for r in small.collect()}
    g = {r.doc_id for r in big.collect()}
    # every doc selected from the FULL corpus that also existed in the
    # small corpus must have been selected there too (ranks only improve
    # when competitors vanish, never worsen)
    assert {d for d in g if d < 200} <= s


def test_sample_exact_short_stratum_and_global(docs, spark):
    from commoncrawl_fetcher_lite_spark.operators.mixing import sample_exact

    tiny = docs.where("doc_id < 5")  # 2 en, 2 de, 1 fr
    out = sample_exact(tiny, k=10, stratum_col="lang")
    assert out.count() == 5  # min(k, |stratum|)
    out_g = sample_exact(docs, k=7)
    assert out_g.count() == 7
    with pytest.raises(ValueError):
        sample_exact(docs, k=0)


def test_sample_exact_uses_window_group_limit(docs):
    from commoncrawl_fetcher_lite_spark.operators.mixing import sample_exact

    plan = _plan(sample_exact(docs, k=5, stratum_col="lang"))
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------- DSIR


@pytest.fixture(scope="module")
def dsir_docs(spark):
    """Two token distributions: 'target-like' docs speak apple/banana,
    'noise' docs speak zebra/quux — disjoint vocabularies so importance
    weights must separate them cleanly."""
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((i, "apple banana apple cherry banana apple", "tgt"))
        else:
            rows.append((i, "zebra quux zorp mumble quux zebra", "noise"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_dsir_weights_separate_target_like_docs(dsir_docs):
    from commoncrawl_fetcher_lite_spark.operators.mixing import dsir_weights

    target = dsir_docs.where("kind = 'tgt'")
    w = dsir_weights(dsir_docs, target, n_buckets=1024).join(
        dsir_docs.select("doc_id", "kind"), "doc_id"
    )
    rows = {r["doc_id"]: r for r in w.collect()}
    assert len(rows) == 60
    tgt = [r["dsir_logw"] for r in rows.values() if r["kind"] == "tgt"]
    noise = [r["dsir_logw"] for r in rows.values() if r["kind"] == "noise"]
    # every target-like doc outscores every noise doc (disjoint vocab)
    assert min(tgt) > max(noise)
    # n_feats = unigrams + bigrams = 6 + 5 for every doc here
    assert {r["n_feats"] for r in rows.values()} == {11}


def test_dsir_single_token_doc_has_no_bigrams(spark):
    from commoncrawl_fetcher_lite_spark.operators.mixing import (
        dsir_hash_features,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "a b")], "doc_id long, text string"
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in dsir_hash_features(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {1: 1, 2: 3}  # 1 unigram; 2 unigrams + 1 bigram


def test_dsir_select_deterministic_across_partitioning(dsir_docs):
    from commoncrawl_fetcher_lite_spark.operators.mixing import dsir_select

    target = dsir_docs.where("kind = 'tgt'")
    a = dsir_select(dsir_docs, target, k=20, n_buckets=512, seed=7)
    b = dsir_select(
        dsir_docs.repartition(13), target.repartition(3), k=20,
        n_buckets=512, seed=7,
    )
    assert [r["doc_id"] for r in a.collect()] == [
        r["doc_id"] for r in b.collect()
    ]
    # a different seed reshuffles the Gumbel draw
    c = dsir_select(dsir_docs, target, k=20, n_buckets=512, seed=8)
    assert [r["doc_id"] for r in a.collect()] != [
        r["doc_id"] for r in c.collect()
    ]


def test_dsir_ratio_join_is_broadcast_and_topk_never_global_sorts(dsir_docs):
    from commoncrawl_fetcher_lite_spark.operators.mixing import dsir_select

    target = dsir_docs.where("kind = 'tgt'")
    plan = _plan(dsir_select(dsir_docs, target, k=5, n_buckets=512))
    # the <=n_buckets-row log-ratio table must broadcast to the scoring
    # pass, and the k-row cut must be TakeOrderedAndProject, not a
    # global Sort+Exchange over the whole weights frame
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
