"""Sequence packing: map a cleaned corpus onto fixed-length training
sequences (GPT-style contiguous packing — concatenate documents in a
deterministic order, chunk the token stream every `seq_len` tokens,
documents may straddle chunk boundaries). This is the step between
`corpus_clean` and a trainer's data loader: the output tells a shard
writer exactly which context windows each document feeds.

No reference analog (the reference stops at emitting extracted bytes);
this is net-new §8 training-pipeline scope.

Scale design — the distributed prefix sum:
A global cumulative token offset over a deterministic order is the whole
computation, and the naive formulation (`Window.orderBy(id)` with no
partitionBy) plans a SINGLE-partition window — the canonical Spark
scale-killer (one task sorts 100 TB). Instead the classic two-pass
prefix-sum shape:

  1. range-repartition by id (ranges ascending with partition index),
     freeze it with an eager localCheckpoint so both passes see the SAME
     partitioning;
  2. per-partition token totals -> driver (BOUNDED: one row per
     partition, ~10^3-10^4 at 100 TB — same bounded-collect class as the
     budget stop position) -> exclusive prefix per partition;
  3. broadcast-join the tiny prefix map back and cumsum WITHIN each
     partition (Window.partitionBy(pid).orderBy(id) — parallel, no
     global sort).

The final offsets are partitioning-independent (offset(doc) = sum of
n_tokens over all smaller ids), so range-sampling nondeterminism in step
1 cannot change the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.operators.text import token_count


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
) -> DataFrame:
    """Assign every document its token offset in the concatenated corpus
    stream (ordered by `id_col` ascending) and the range of `seq_len`-token
    training sequences it spans.

    Output: (doc_id, n_tokens, offset, seq_first, seq_last) — `offset` is
    the exclusive prefix sum of token counts, `seq_first`/`seq_last` the
    first/last context-window index the document's tokens land in
    (inclusive; equal when the document fits inside one window).
    Zero-token documents (empty text) are dropped — they contribute no
    stream positions and `seq_first` would be ill-defined.
    """
    if seq_len < 1:
        raise ValueError(f"pack_sequences: seq_len must be >= 1, got {seq_len}")
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)

    ranged = (
        toks.repartitionByRange(F.col("doc_id"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # pass 1: per-partition totals, exclusive prefix computed driver-side
    # over one row per partition (bounded; see module docstring).
    totals = sorted(
        (r["_pid"], r["t"])
        for r in ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    )
    prefix, acc = [], 0
    for pid, t in totals:
        prefix.append((pid, acc))
        acc += t
    prefix_df = spark.createDataFrame(prefix, "_pid int, _prefix long")

    # pass 2: within-partition cumsum + broadcast prefix offset.
    w = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.join(F.broadcast(prefix_df), "_pid")
        .withColumn(
            "offset",
            F.col("_prefix") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            # `div` = exact int64 floor division (offsets are non-negative);
            # F.floor(col / N) would round-trip through double and lose
            # exactness past 2^53 — real at 100 TB token-stream offsets.
            F.expr(f"`offset` div {int(seq_len)}").alias("seq_first"),
            F.expr(f"(`offset` + n_tokens - 1) div {int(seq_len)}").alias(
                "seq_last"
            ),
        )
    )
    return out


def shard_manifest(packed: DataFrame) -> DataFrame:
    """Roll a `pack_sequences` frame up into one row per training
    sequence: which documents feed sequence `seq_id` and how many of its
    token slots they fill. A shard writer maps `seq_id` ranges to output
    files; the doc list is what it must co-locate.

    A document spanning k sequences contributes to k rows (explode over
    its seq_first..seq_last range — bounded fan-out: k = ceil(n_tokens /
    seq_len)). Shuffle key is the int64 seq_id; rows are skinny.

    Output: (seq_id, n_docs, first_doc, last_doc).
    """
    spans = packed.select(
        "doc_id",
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    )
    return spans.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
