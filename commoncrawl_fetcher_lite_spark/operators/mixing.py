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
