"""Training-shard prep operators: sequence packing (operators/packing.py),
passage-level duplicate spans, C4-style line dedup
(dedup.duplicate_span_pairs / line_dedup), unigram LM scoring."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.operators.dedup import (
    duplicate_span_pairs,
    line_dedup,
)
from commoncrawl_fetcher_lite_spark.operators.packing import (
    pack_sequences,
    shard_manifest,
)
from commoncrawl_fetcher_lite_spark.operators.text import (
    corpus_stats,
    unigram_logprob,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_offsets_contiguous(spark):
    # token counts 3, 5, 2, 7 -> offsets 0, 3, 8, 10
    docs = _docs(spark, ["a b c", "a b c d e", "x y", "a b c d e f g"])
    rows = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert [rows[i]["offset"] for i in range(4)] == [0, 3, 8, 10]
    assert [rows[i]["n_tokens"] for i in range(4)] == [3, 5, 2, 7]
    # doc 0: tokens [0,3) -> seq 0 only; doc 1: [3,8) -> seqs 0-1;
    # doc 3: [10,17) -> seqs 2-4
    assert (rows[0]["seq_first"], rows[0]["seq_last"]) == (0, 0)
    assert (rows[1]["seq_first"], rows[1]["seq_last"]) == (0, 1)
    assert (rows[3]["seq_first"], rows[3]["seq_last"]) == (2, 4)


def test_pack_is_partitioning_independent(spark):
    """Offsets over many range partitions (most empty at this size) match
    the serial prefix sum exactly — the two-pass distributed shape cannot
    depend on where partition bounds land."""
    texts = [f"tok{i} " * ((i * 7) % 13 + 1) for i in range(200)]
    docs = _docs(spark, texts).repartition(8)
    got = {
        r["doc_id"]: r["offset"]
        for r in pack_sequences(docs, seq_len=16).collect()
    }
    acc = 0
    for i, t in enumerate(texts):
        assert got[i] == acc
        acc += len(t.split())


def test_shard_manifest_covers_stream(spark):
    texts = [f"tok{i} " * ((i * 5) % 11 + 1) for i in range(60)]
    docs = _docs(spark, texts)
    packed = pack_sequences(docs, seq_len=8)
    man = {r["seq_id"]: r for r in shard_manifest(packed).collect()}
    total = sum(len(t.split()) for t in texts)
    n_seqs = (total + 7) // 8
    # every context window in the stream is fed by >=1 doc, none beyond
    assert sorted(man) == list(range(n_seqs))
    # sum of per-seq doc memberships == sum of per-doc span widths
    spans = packed.select(
        F.sum(F.col("seq_last") - F.col("seq_first") + 1).alias("s")
    ).collect()[0]["s"]
    assert sum(r["n_docs"] for r in man.values()) == spans
    # first/last doc ids bracket correctly on the first window
    assert man[0]["first_doc"] == 0


def test_pack_plan_has_no_global_window(spark):
    """The offset computation must never plan a single-partition window
    (the naive Window.orderBy(id) formulation) — the whole point of the
    two-pass prefix sum. The only windows allowed are partitioned by
    _pid; no Exchange SinglePartition anywhere in the plan."""
    docs = _docs(spark, [f"w{i} x y z" for i in range(50)])
    df = pack_sequences(docs, seq_len=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Window" in plan  # the cumsum window is there...
    assert "Exchange SinglePartition" not in plan  # ...but never global


def test_duplicate_spans_finds_copied_paragraph(spark):
    para = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    texts = [
        para + " unique one tail here",
        "different head entirely now " + para,
        "no overlap with anything else at all whatsoever in this row",
        "another totally distinct document text goes right here today",
    ]
    pairs = duplicate_span_pairs(
        _docs(spark, texts), n=5, stride=4, min_shared=2, max_df=50
    ).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [(0, 1)]
    # the 10-token shared paragraph yields 6 shared 5-grams in each doc;
    # winnowing their hashes collapses to exactly 2 distinct shared
    # fingerprints (pinned offline with hashlib.md5 — same hex both
    # engines)
    assert pairs[0]["n_shared"] == 2


def test_line_dedup_keeps_first_occurrence(spark):
    lines = spark.createDataFrame(
        [
            (0, 0, "the quick brown fox"),
            (0, 1, "unique line alpha"),
            (1, 0, "the quick brown fox"),  # dup of doc0 line0 -> dropped
            (1, 1, "unique line beta"),
            (2, 0, "the quick brown fox"),  # doc entirely duplicated
        ],
        "doc_id long, line_no long, line string",
    )
    rows = {r["doc_id"]: r for r in line_dedup(lines).collect()}
    assert rows[0]["clean_text"] == "the quick brown fox unique line alpha"
    assert (rows[0]["n_kept"], rows[0]["n_dropped"]) == (2, 0)
    assert rows[1]["clean_text"] == "unique line beta"
    assert (rows[1]["n_kept"], rows[1]["n_dropped"]) == (1, 1)
    # fully-duplicated doc still appears, empty
    assert rows[2]["clean_text"] == ""
    assert (rows[2]["n_kept"], rows[2]["n_dropped"]) == (0, 1)


def test_line_dedup_within_doc_repeat(spark):
    """A line repeated INSIDE one document also keeps only its first
    occurrence (C4 drops any later occurrence, same doc or not)."""
    lines = spark.createDataFrame(
        [(0, 0, "repeat me"), (0, 1, "middle"), (0, 2, "repeat me")],
        "doc_id long, line_no long, line string",
    )
    r = line_dedup(lines).collect()[0]
    assert r["clean_text"] == "repeat me middle"
    assert (r["n_kept"], r["n_dropped"]) == (2, 1)


def test_unigram_logprob_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # freqs: a=2, b=2, c=1, total=5
    nll0 = -(3 * math.log(2 / 5)) / 3
    nll1 = -(math.log(2 / 5) + math.log(1 / 5)) / 2
    assert rows[0]["n_tokens"] == 3 and rows[1]["n_tokens"] == 2
    assert abs(rows[0]["unigram_nll"] - nll0) < 1e-6
    assert abs(rows[1]["unigram_nll"] - nll1) < 1e-6
    # rarer tokens -> higher NLL
    assert rows[1]["unigram_nll"] > rows[0]["unigram_nll"]


def test_corpus_stats_percentile_interpolation(spark):
    """Exact percentile uses the standard (N-1)*p linear interpolation —
    pinned so the DuckDB quantile_cont oracle stays equivalent."""
    docs = spark.createDataFrame(
        [(i, "t " * n, "en") for i, n in enumerate([10, 20, 30, 40])],
        "doc_id long, text string, lang string",
    )
    r = corpus_stats(docs).collect()[0]
    assert (r["n_docs"], r["total_tokens"]) == (4, 100)
    assert r["mean_tokens"] == 25.0
    assert r["p50_tokens"] == 25.0  # (20+30)/2
    assert r["p90_tokens"] == 37.0  # 30 + 0.7*(40-30)
    assert r["p99_tokens"] == 39.7


def test_duplicate_spans_stop_fingerprint_cap(spark):
    """A span present in EVERY doc (boilerplate) is df-capped out: no
    pairs emitted from it, while a rare copied span still pairs."""
    boiler = "terms of service apply to all pages here"
    rare = "rare shared span only in two documents exactly"
    texts = [f"{boiler} filler{i} pad{i} more{i} x{i}" for i in range(20)]
    texts += [f"{rare} tail one two", f"head extra {rare}"]
    pairs = duplicate_span_pairs(
        _docs(spark, texts), n=5, stride=4, min_shared=1, max_df=5
    ).collect()
    # boiler-span fingerprints have df=20 > cap (dropped); per-doc filler
    # grams are df=1 (dropped); only the rare span pairs — its 8 tokens
    # give one full winnow window -> exactly 1 shared fingerprint
    # (pinned offline)
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [(20, 21)]
    assert pairs[0]["n_shared"] == 1


def test_duplicate_spans_df_gate_never_concentrates_hot_fp(spark):
    """The df gate must be a groupBy (map-side partial combine), NOT a
    count-over-Window.partitionBy(fp): a boilerplate fingerprint shared
    by 10^6 docs would otherwise buffer as ONE window group in a single
    task before the max_df filter saw it. Plan shape: no Window operator
    anywhere in the pipeline, and a planted hot fp (df=40 ≫ max_df=3)
    still gets gated out."""
    boiler = "this exact boilerplate sentence appears on every single page"
    texts = [f"{boiler} u{i} v{i} w{i} z{i}" for i in range(40)]
    texts += ["rare pair span alpha beta gamma delta epsilon tail one",
              "other rare pair span alpha beta gamma delta epsilon tail"]
    df = duplicate_span_pairs(
        _docs(spark, texts), n=5, stride=4, min_shared=1, max_df=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    got = [(r["doc_id_a"], r["doc_id_b"]) for r in df.collect()]
    assert got == [(40, 41)]


def test_pack_sequences_rejects_bad_seq_len(spark):
    from commoncrawl_fetcher_lite_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
