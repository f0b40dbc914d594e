"""Deterministic corpus mixing and training-shard assignment.

The operators a training-data pipeline runs between "cleaned corpus" and
"tokenized shards" — mix_corpus and shard_shuffle below, plus
holdout_split (fractional train/val/test) and sample_exact (exact-count
stratified carve-out), all keyed on the same seeded md5 lanes:

  * mix_corpus — per-stratum up/down-sampling to hit a target data mix
    (the LLaMA/Pile-style "weights" table: en×0.7, code×2.0, …). A rate
    r produces floor(r) full copies of every doc plus one more with
    probability frac(r) — decided by a seeded md5 gate, NOT an unseeded
    random draw, so reruns, retries, and different cluster sizes all
    produce the identical corpus (the same determinism contract as
    functions/sampling.sample_gate; md5 here instead of xxhash64 so the
    DuckDB oracle can reproduce the gate exactly).
  * shard_shuffle — the global "shuffle the training data" step expressed
    scale-correctly: a seeded md5 key assigns every doc a pseudo-random
    (shard_id, pos_in_shard). Sorting WITHIN a shard is a window over one
    shard's rows (bounded: corpus/n_shards — pick n_shards so a shard
    fits an executor), never a global orderBy, which would be an
    Exchange SinglePartition at 100 TB.

Both are pure Catalyst — no Python in the row path; the md5 gate keeps
whole-stage codegen intact.

Reference scope note: the reference (tballison/commoncrawl-fetcher-lite)
has no mixing/shuffling stage — its closest analogue is the unseeded
per-clause sampler (selector/AbstractSamplingSelector.java:40-55), whose
determinism fix is inherited here. These operators are §8 scope (training
pipeline needs beyond the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def _md5_hex(key: Column, seed: int, lane: str) -> Column:
    """md5 hex of '<key>:<lane>:<seed>' — the seeded-lane key format every
    mixing decision (and its DuckDB oracle twin) derives from. Lane
    separates independent decisions on the same key (epoch gate vs shard
    placement vs holdout)."""
    return F.md5(F.concat_ws(":", key.cast("string"), F.lit(lane), F.lit(str(seed))))


def _md5_u32(key: Column, seed: int, lane: str) -> Column:
    """First 8 hex chars of the lane hash as an integer in [0, 2^32)."""
    return F.conv(F.substring(_md5_hex(key, seed, lane), 1, 8), 16, 10).cast("long")


def _md5_unit(key: Column, seed: int, lane: str) -> Column:
    """Deterministic uniform [0,1) from (key, seed, lane)."""
    return _md5_u32(key, seed, lane).cast("double") / F.lit(_U32)


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: int = 42,
) -> DataFrame:
    """Up/down-sample per stratum to the target mix: rate 0.25 keeps a
    deterministic quarter of that stratum; rate 2.5 emits 2 copies of
    every doc plus a third for a quarter of them. Output = input columns
    + `copy_idx` (0-based), one row per emitted copy.

    The fractional decision is ONE md5 per row compared against the
    fractional part — map-only, no shuffle, no state; the full-epoch
    copies come from exploding a per-row sequence (bounded by the max
    configured rate, a constant). Downstream packing/shuffling treats
    (doc, copy_idx) as independent documents."""
    if any(r < 0 for r in weights.values()) or default_rate < 0:
        raise ValueError("mix_corpus: rates must be >= 0")
    rate = F.lit(float(default_rate))
    for lang, r in sorted(weights.items()):
        rate = F.when(F.col(stratum_col) == lang, F.lit(float(r))).otherwise(rate)
    epochs = F.floor(rate).cast("int")
    frac = rate - F.floor(rate)
    gate = _md5_unit(F.col(id_col), seed, "mix") < frac
    n_copies = epochs + gate.cast("int")
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0).cast("long"), (n_copies - 1).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return docs.withColumn("copy_idx", F.explode(copies))


def holdout_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test assignment: one md5 lane per row maps
    into cumulative fraction buckets (`{"train": .98, "val": .01,
    "test": .01}` → u<0.98 train, u<0.99 val, else test). Adds a `split`
    column; map-only, no shuffle, no state.

    Determinism is the entire point: membership depends only on
    (id, seed), so re-running the pipeline, changing cluster size, or
    adding NEW documents never moves an EXISTING document across the
    train/eval boundary — the property that prevents silent train-on-test
    contamination when a corpus is rebuilt. Fraction keys are assigned in
    the dict's given order; fractions must sum to 1 (±1e-9)."""
    if not fractions:
        raise ValueError("holdout_split: fractions is empty")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("holdout_split: fractions must be >= 0")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("holdout_split: fractions must sum to 1")
    u = _md5_unit(F.col(id_col), seed, "split")
    names = list(fractions)
    expr = F.lit(names[-1])
    cum = 0.0
    edges = []
    for name in names[:-1]:
        cum += fractions[name]
        edges.append((name, cum))
    for name, edge in reversed(edges):
        expr = F.when(u < F.lit(edge), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def shard_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Assign every row a deterministic pseudo-random (shard_id,
    pos_in_shard): shard by one md5 lane, order within the shard by a
    second (ties broken by id, so duplicate keys stay deterministic).

    Scale shape: ONE hash-partition shuffle on shard_id, then a per-shard
    sort — n_shards is the operator's memory knob (100 TB / 1 GiB shards
    → n_shards ≈ 10^5; each window partition is one output shard). The
    naive alternative — row_number over a global orderBy(random) — is a
    single-partition exchange and is exactly what this operator exists to
    avoid."""
    if n_shards < 1:
        raise ValueError("shard_shuffle: n_shards must be >= 1")
    key = F.col(id_col)
    shard = (_md5_u32(key, seed, "shard") % F.lit(n_shards)).alias("shard_id")
    order_key = _md5_hex(key, seed, "order")
    out = df.select("*", shard, order_key.alias("_ord"))
    w = Window.partitionBy("shard_id").orderBy(F.col("_ord"), key)
    return out.withColumn(
        "pos_in_shard", (F.row_number().over(w) - 1).cast("long")
    ).drop("_ord")


def sample_exact(
    df: DataFrame,
    k: int,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum (one global stratum when
    stratum_col is None), deterministically — the "carve out 10k eval
    docs per language" operation. Rows are ranked inside each stratum by
    the seeded md5 sample lane (ties by id), so the selection is a pure
    function of (ids, seed): rerun/partitioning/cluster-size invariant,
    and growing a stratum only ever displaces rows at the selection
    boundary, never reshuffles the whole sample (holdout_split's
    anti-contamination argument applied to exact counts). Adds
    `sample_rank` (1-based).

    Scale shape: the rank filter compiles to WindowGroupLimit
    (plan-audited), which keeps a running top-k PER MAP PARTITION before
    the stratum exchange — no reducer ever sorts or buffers a whole
    stratum, so a billion-doc language costs the same shuffle as its
    top-k survivors plus partial-k per input partition."""
    if k < 1:
        raise ValueError("sample_exact: k must be >= 1")
    order = [_md5_hex(F.col(id_col), seed, "sample"), F.col(id_col)]
    w = (
        Window.partitionBy(stratum_col) if stratum_col else Window.partitionBy()
    ).orderBy(*order)
    if stratum_col is None:
        # a global top-k over Window.partitionBy() would be a single
        # partition; rank in a constant pseudo-stratum instead so the
        # same WindowGroupLimit machinery applies, then drop it
        w = Window.partitionBy(F.lit(0)).orderBy(*order)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: int = 42,
) -> DataFrame:
    """Fill a per-stratum TOKEN budget (the "data mix in tokens" spec —
    '30B English tokens, 5B code tokens' — that real mix tables are
    written in, where mix_corpus's per-DOC rates need the mean doc
    length to convert): documents are ordered inside each stratum by a
    seeded md5 lane (deterministic shuffle, ties by id) and kept while
    the stratum's running token total is below its budget. The document
    that CROSSES the budget boundary is included, so a stratum with
    enough data always reaches >= its budget and the overshoot is at
    most one document. Output: (id, stratum, n_tokens,
    cum_tokens_before) for kept rows; a pure function of (ids, seed,
    budgets) — rerun / partitioning / cluster-size invariant, and
    adding new documents only perturbs selection near the boundary
    (holdout_split's anti-contamination argument in token space).

    Scale shape — pack_sequences' two-pass prefix sum, per stratum: a
    naive `Window.partitionBy(stratum)` cumsum concentrates each
    stratum in ONE task (a 30B-token language is most of the corpus).
    Instead: range-repartition by (stratum, order-key) — frozen with an
    eager localCheckpoint so both passes see the same layout — then
    per-(partition, stratum) totals to the driver (bounded: partitions ×
    strata rows), exclusive prefix per stratum across ascending
    partitions, broadcast back, and cumsum WITHIN each partition. No
    task ever holds more than its range slice of a stratum.
    """
    if any(b < 0 for b in budgets.values()) or default_budget < 0:
        raise ValueError("token_budget_mix: budgets must be >= 0")
    from commoncrawl_fetcher_lite_spark.operators.text import token_count

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        _md5_hex(F.col(id_col), seed, "budget").alias("_k"),
    )
    ranged = (
        toks.repartitionByRange(F.col(stratum_col), F.col("_k"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = ranged.groupBy("_pid", stratum_col).agg(
        F.sum("n_tokens").alias("t")
    ).collect()
    acc: dict[str, int] = {}
    prefix_rows = []
    for r in sorted(totals, key=lambda r: (r[stratum_col], r["_pid"])):
        s = r[stratum_col]
        prefix_rows.append((int(r["_pid"]), s, acc.get(s, 0)))
        acc[s] = acc.get(s, 0) + int(r["t"])
    prefix_df = spark.createDataFrame(
        prefix_rows, f"_pid int, {stratum_col} string, _prefix long"
    )
    w = (
        Window.partitionBy("_pid", stratum_col)
        .orderBy("_k", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(int(default_budget))
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(stratum_col) == s, F.lit(int(b))).otherwise(budget)
    return (
        ranged.join(F.broadcast(prefix_df), ["_pid", stratum_col])
        .withColumn(
            "cum_tokens_before",
            F.col("_prefix") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
        .where(F.col("cum_tokens_before") < budget)
        .select(id_col, stratum_col, "n_tokens", "cum_tokens_before")
    )


def dsir_hash_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
) -> DataFrame:
    """Hashed n-gram feature extraction for DSIR (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    each document's unigrams and bigrams are hashed into `n_buckets`
    fixed buckets — the dimensionality reduction that makes importance
    estimation tractable at corpus scale (the distribution lives in a
    B-sized table no matter how large the corpus is).

    Output: (doc_id, bucket) — ONE ROW PER FEATURE OCCURRENCE (the
    weight sum is count-weighted, so multiplicity matters).

    The hash is unseeded md5 (first 8 hex chars mod B) so the DuckDB
    oracle reproduces bucket ids bit-for-bit; the bigram array is built
    with zip_with over two slices of ONE let-bound token array — no
    re-tokenization per n-gram order, no Python in the row path."""
    if n_buckets <= 0:
        raise ValueError("dsir_hash_features: n_buckets must be > 0")
    from commoncrawl_fetcher_lite_spark.functions.letbind import let
    from commoncrawl_fetcher_lite_spark.operators.text import tokens_nonempty

    feats = let(
        tokens_nonempty(text_col),
        lambda t: F.concat(
            t,
            F.zip_with(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ),
    )
    from commoncrawl_fetcher_lite_spark.functions.letbind import (
        spread_for_compute,
    )

    # spread before the tokenize+md5 explode (r7): narrow small-file scans
    # pin this map stage to 1-2 cores. Order-safety of the downstream
    # per-doc float sum: a doc's exploded rows stay contiguous in ONE
    # partition (docs are repartitioned whole), and the scoring join is
    # broadcast (no exchange), so each doc's logratio sum folds in the
    # same feature order as before.
    return spread_for_compute(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(feats).alias("f")
    ).select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("f")), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance log-weights: score every raw document by how much
    its hashed-n-gram distribution looks like the TARGET corpus rather
    than the RAW corpus — log w(x) = Σ_features [log p_target(b(f)) −
    log p_raw(b(f))], with add-`alpha` smoothing on both bucket
    distributions. High weight = target-like text (the signal DSIR
    resamples on to select pretraining data matching a quality/domain
    target such as Wikipedia+books).

    Output: (doc_id, n_feats, dsir_logw[round 6]).

    Scale shape: feature explode is map-only scan work; the two bucket
    histograms are groupBy(bucket) on int keys where map-side combine
    collapses the zipfian fan-in, and each is AT MOST `n_buckets` rows —
    the log-ratio table therefore broadcasts unconditionally (8192 rows
    default; the paper's 10^4 likewise). The per-doc sum is one
    groupBy(doc_id) over the exploded frame joined map-side against the
    broadcast ratio table: ZERO all-to-all shuffles carry anything wider
    than (doc_id, bucket). The skinny feature frame is checkpointed once
    because both the histogram and the scoring pass read it — same
    materialize-don't-recompute call as duplicate_span_pairs."""
    if alpha <= 0:
        raise ValueError("dsir_weights: alpha must be > 0 (smoothing)")
    fr = dsir_hash_features(
        docs, text_col, id_col, n_buckets
    ).localCheckpoint(eager=True)
    ft = dsir_hash_features(target, text_col, id_col, n_buckets)
    cr = fr.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    ct = ft.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
    tot_r = cr.agg(F.sum("c_raw").cast("double").alias("t_raw"))
    tot_t = ct.agg(
        F.coalesce(F.sum("c_tgt"), F.lit(0)).cast("double").alias("t_tgt")
    )
    a = float(alpha)
    ab = a * n_buckets
    lr = (
        cr.join(ct, "bucket", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + a)
                    / (F.col("t_tgt") + ab)
                )
                - F.log((F.col("c_raw") + a) / (F.col("t_raw") + ab))
            ).alias("logratio"),
        )
    )
    return (
        fr.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("logratio"), 6).alias("dsir_logw"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """DSIR's selection step: Gumbel-top-k resampling WITHOUT
    replacement over the importance weights — adding an independent
    Gumbel(0,1) to each log-weight and taking the k largest draws
    exactly k docs with probability proportional to w(x), the
    importance-resampling step of the paper. The Gumbel noise is
    derived from a seeded md5 lane (−ln(−ln u), u uniform from the
    doc id), so the selected set is a pure function of (ids, seed) —
    rerun / partitioning / cluster-size invariant, and the DuckDB
    oracle reproduces the draw exactly. Scores round to 6dp with a
    doc-id tie-break so the cut line is engine-independent.

    Output: the k selected rows (doc_id, n_feats, dsir_logw,
    sel_score), descending by score.

    Scale shape: dsir_weights is one row per doc; the top-k compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k),
    never a global sort."""
    if k <= 0:
        raise ValueError("dsir_select: k must be > 0")
    w = dsir_weights(docs, target, text_col, id_col, n_buckets, alpha)
    u = (_md5_u32(F.col("doc_id"), seed, "dsir_gumbel").cast("double") + 0.5) / F.lit(
        _U32
    )
    score = F.round(F.col("dsir_logw") - F.log(-F.log(u)), 6)
    return (
        w.withColumn("sel_score", score)
        .orderBy(F.desc("sel_score"), F.col("doc_id"))
        .limit(int(k))
    )
