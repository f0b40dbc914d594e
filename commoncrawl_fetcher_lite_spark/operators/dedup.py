"""Deduplication operators for large-scale training-data pipelines.

No reference analog (the reference's only dedup is the emitter's
onExists=skip, ExtractorConfig.java:276); these are the net-new corpus ops.

All hot paths are Catalyst expressions (shingling, minhash, banding are
pure `F.transform`/`F.array_min`/`F.xxhash64` over arrays — JVM-side,
codegen'd); Python appears only in SimHash bit-packing (Arrow-batched
numpy).

Scale notes per operator:
  * exact_dedup: one hash-groupBy shuffle on a 16-byte key (md5) — the
    canonical 100 TB dedup; AQE handles skew (identical docs cluster).
  * minhash_lsh: candidate generation is explode(bands) + self-join on
    (band_id, band_hash) — shuffle keys are 16 bytes, join fan-out bounded
    by bucket sizes; exact-verify only on candidates. This is the standard
    shingle→minhash→band→bucket-join pipeline.
  * ngram_jaccard_pairs: EXACT all-pairs — O(n²), for oracle checks and
    small candidate sets only; minhash_lsh is the scale path.
  * simhash: near-dup by Hamming distance with band-bucketing on 16-bit
    chunks (any pair within distance d shares ≥1 of d+1 chunks exactly).
  * embedding_neardup_pairs: exact cosine pairs (O(n²) baseline);
    similarity.py's LSH variant is the scale path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------- shingling


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles, pure Catalyst: split → sliding
    concat_ws over sequence indexes → array_distinct.

    The token array is LET-BOUND: a lambda body that closes over the raw
    split() expression re-evaluates the split once per produced element
    (HOF lambda bodies are full expression trees) — measured 20x slowdown.
    Binding via letbind.let makes it a per-row constant."""
    from commoncrawl_fetcher_lite_spark.functions.letbind import let

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return let(
        F.split(F.trim(c), r"\s+"),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))
                ),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    )


# ------------------------------------------------------------ exact dedup


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with the
    kept (min) id and duplicate count."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ------------------------------------------------------------ minhash LSH


def base_shingle_hashes(shingles: Column) -> Column:
    """xxhash64 per shingle — the ONLY string hashing, JVM-side."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def _minhash_udf(num_perm: int):
    """Vectorized permutation mins from base hashes: h_p(x) = mix(h1 + p*h2)
    (Kirsch-Mitzenmacher double hashing over splitmix-mixed lanes). The
    string hashing happened JVM-side; Python sees only int64 arrays and
    does one (n_shingles × num_perm) numpy min per row — Arrow-batched,
    ~10^8 lanes/sec/core. Interpreted HOF minhash (64 nested transforms)
    measured ~20x slower at sf0.1."""
    from pyspark.sql.functions import pandas_udf

    P = np.uint64(0x9E3779B97F4A7C15)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)

    def mix(x: np.ndarray) -> np.ndarray:
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & mask
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)) & mask
        return x ^ (x >> np.uint64(31))

    perms = np.arange(num_perm, dtype=np.uint64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(base: pd.Series) -> pd.Series:
        out = []
        for arr in base:
            h1 = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            h2 = mix(h1) | np.uint64(1)
            lanes = mix((h1[:, None] + perms[None, :] * h2[:, None]) & mask)
            out.append(lanes.min(axis=0).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_signature(shingles: Column, num_perm: int = 64) -> Column:
    """num_perm minhashes of a shingle array (hybrid JVM hash + numpy min)."""
    return _minhash_udf(num_perm)(base_shingle_hashes(shingles))


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash bucket join.

    bands=16, rows=4 over 64 perms → pairs with J≈0.5 caught w.p. ~0.88,
    J≈0.7 w.p. ~0.998. Output: (id_a, id_b) candidates, id_a < id_b."""
    from commoncrawl_fetcher_lite_spark.functions.letbind import let

    rows_per_band = num_perm // bands
    from commoncrawl_fetcher_lite_spark.functions.letbind import spread_for_compute

    sh = spread_for_compute(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    ).select("id", word_shingles("_t", n).alias("sh")).where(F.size("sh") > 0)
    # one let-bound pass: signature computed once per row, band hashes
    # derived from the bound array (element_at with the band lambda var) —
    # no per-band re-evaluation of the shingle/minhash chain.
    bands_expr = let(
        minhash_signature(F.col("sh"), num_perm),
        lambda sig: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band_id"),
                F.xxhash64(
                    *[
                        F.element_at(sig, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]
                ).alias("band_hash"),
            ),
        ),
    )
    buckets = sh.select("id", F.explode(bands_expr).alias("b")).select(
        "id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )
    # persist: the self-join would otherwise run the whole shingle→minhash
    # pipeline twice (once per side). Bucket rows are tiny (id + 2 longs).
    buckets = buckets.persist()
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def verify_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs (JVM set ops)."""
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    out = (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard ≥ threshold (oracle-checkable O(n²)
    baseline; use minhash_lsh_candidates ∘ verify_jaccard at scale)."""
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).where(F.size("sh") > 0)
    a = sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------- simhash


def with_simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token-hash bits, packed with
    vectorized numpy inside mapInPandas (bit-twiddling is the one step
    Catalyst can't express cleanly)."""
    from commoncrawl_fetcher_lite_spark.functions.letbind import spread_for_compute

    sel = spread_for_compute(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_ids, out_sh = [], []
            for rid, text in zip(pdf["id"], pdf["t"]):
                toks = (text or "").split()
                if not toks:
                    out_ids.append(rid)
                    out_sh.append(0)
                    continue
                # FNV-1a 64 per token, vectorized bit expansion
                hs = np.array(
                    [_fnv1a64(tk) for tk in toks], dtype=np.uint64
                )
                bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = bits.astype(np.int64) * 2 - 1
                agg = votes.sum(axis=0)
                sh = np.uint64(0)
                for i in np.nonzero(agg > 0)[0]:
                    sh |= np.uint64(1) << np.uint64(i)
                out_ids.append(rid)
                out_sh.append(int(sh) - (1 << 64) if sh >= (1 << 63) else int(sh))
            yield pd.DataFrame({"id": out_ids, "simhash": out_sh})

    return sel.mapInPandas(
        run,
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("simhash", T.LongType())]
        ),
    )


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    # FNV avalanche is weak (near-identical strings give correlated bits,
    # which collapses SimHash distances) — finalize with splitmix64 mixing
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return h ^ (h >> 31)


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 16-bit chunk
    bucketing (pigeonhole: ≤3 differing bits over 4 chunks → ≥1 identical
    chunk), then exact popcount verify — both JVM-side."""
    sh = with_simhash(docs, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
            )
            for c in range(4)
        ]
    )
    buckets = sh.select("id", "simhash", F.explode(chunks).alias("c")).select(
        "id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk")
    )
    buckets = buckets.persist()  # self-join would recompute simhash twice
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).where(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-dup pairs (O(n²) baseline; the LSH-bucketed scale
    path lives in similarity.py). Double precision, explicit formula."""
    v = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    norm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    v = v.withColumn("n", norm)
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
