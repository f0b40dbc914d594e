"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k per query; O(|Q|·|N|) cross join.
    Correctness baseline; fine when |Q| is small or as the final re-rank.
  * lsh_topk — random-hyperplane LSH (SimHash for vectors): bucket by
    sign-bit signature prefixes, search only same-bucket candidates, exact
    re-rank inside buckets. The scale path: candidate generation is a
    bucket-key equi-join (shuffle on small int keys), probes multiple
    signature rotations to raise recall.

All vector math is double-precision Catalyst expressions (zip_with +
aggregate) — no Python in the scoring loop. The hyperplanes are a
deterministic broadcast literal derived from a seed (no Date/random at plan
time).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(v: str | Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "v",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank)."""
    scored = (
        queries.crossJoin(corpus)
        .where(F.col(corpus_id) != F.col(query_id))
        .select(
            F.col(query_id),
            F.col(corpus_id).alias("neighbor_id"),
            F.round(
                _dot(query_vec, corpus_vec) / (_norm(query_vec) * _norm(corpus_vec)), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller over a
    splitmix-style hash stream; pure function of seed)."""
    out = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    def nxt() -> float:
        nonlocal state
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        return (z >> 11) / float(1 << 53)  # uniform [0,1)
    for _ in range(n_planes):
        plane = []
        i = 0
        while i < dim:
            u1, u2 = max(nxt(), 1e-12), nxt()
            r = math.sqrt(-2.0 * math.log(u1))
            plane.append(r * math.cos(2 * math.pi * u2))
            if i + 1 < dim:
                plane.append(r * math.sin(2 * math.pi * u2))
            i += 2
        out.append(plane[:dim])
    return out


def lsh_signature(vec_col: str | Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as int (n_planes ≤ 31): bit_p = dot(v, plane_p)>0."""
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec_col, lit_plane) > 0).cast("int")
        bits.append(bit * F.lit(1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_rotations: int = 3,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "v",
) -> DataFrame:
    """Approximate top-k: union of same-bucket candidates over n_rotations
    independent signatures, exact cosine re-rank. Recall grows with
    rotations; candidates per query ≈ rotations · |N| / 2^n_planes."""
    # all rotations in ONE pass per side: signature array + posexplode →
    # a single equi-join on (rotation, bucket) instead of n_rotations
    # separate scans and unions. Signatures are ONE numpy matmul per Arrow
    # batch (sign bits of V @ planes.T) — the interpreted per-plane
    # zip_with/aggregate dot products measured ~100x slower.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from commoncrawl_fetcher_lite_spark.functions.letbind import spread_for_compute

    all_planes = [
        _hyperplanes(dim, n_planes, seed + rot * 1000) for rot in range(n_rotations)
    ]
    planes_mat = np.array(all_planes, dtype=np.float64).reshape(
        n_rotations * n_planes, dim
    )
    pow2 = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def sig_udf(vecs):  # pd.Series -> pd.Series (hints omitted: PEP 563
        # stringifies them under `from __future__ import annotations` and
        # pyspark's hint introspection then rejects the signature)
        V = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (V @ planes_mat.T) > 0  # (batch, rot*planes)
        bits = bits.reshape(len(V), n_rotations, n_planes)
        out = (bits * pow2[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(out))

    def buckets(df: DataFrame, vec: str, keep: list[str]) -> DataFrame:
        return spread_for_compute(df).select(
            *keep, vec, F.posexplode(sig_udf(F.col(vec))).alias("rot", "bucket")
        )

    qs = buckets(queries, query_vec, [query_id])
    cs = buckets(corpus, corpus_vec, [corpus_id])
    cand = (
        qs.join(cs, ["rot", "bucket"])
        .where(F.col(corpus_id) != F.col(query_id))
        .select(query_id, F.col(corpus_id).alias("neighbor_id"), query_vec, corpus_vec)
        .dropDuplicates([query_id, "neighbor_id"])
    )
    scored = cand.select(
        F.col(query_id),
        F.col("neighbor_id"),
        F.round(
            _dot(query_vec, corpus_vec) / (_norm(query_vec) * _norm(corpus_vec)), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "v",
) -> DataFrame:
    """IVF-flat ANN (the cell-partitioned scale path): corpus vectors are
    assigned to their nearest coarse centroid, queries probe the n_probe
    nearest cells, exact cosine re-rank inside the probed cells.

    The coarse quantizer is DETERMINISTIC: the n_cells lowest-id corpus
    vectors serve as centroids (swap in k-means centroids on a real
    cluster — the assignment/probe/re-rank plumbing is identical). That
    makes the whole index a pure function of the data, so the DuckDB
    oracle reproduces it exactly.

    Scale shape: the centroid matrix is tiny (n_cells x dim) and rides
    into an Arrow-batched pandas UDF as a numpy constant — one matmul per
    batch assigns cells, no per-row Python. Candidate generation is an
    equi-join on the int cell id (candidates per query ~ n_probe/n_cells
    of the corpus), and the re-rank is Catalyst zip_with/aggregate."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from commoncrawl_fetcher_lite_spark.functions.letbind import spread_for_compute

    cent_rows = (
        corpus.where(F.col(corpus_id) < n_cells)
        .select(corpus_id, corpus_vec)
        .collect()
    )  # n_cells rows — tiny, deliberate driver constant
    cent_rows.sort(key=lambda r: r[corpus_id])
    C = np.array([list(r[corpus_vec]) for r in cent_rows], dtype=np.float64)
    cids = np.array([r[corpus_id] for r in cent_rows], dtype=np.int64)
    cn = np.sqrt((C * C).sum(axis=1))

    def _cell_sims(vecs: pd.Series) -> np.ndarray:
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        # dot first, then divide by the norm product — matches the oracle's
        # list_dot_product(v,c)/(|v|*|c|) op order bit-for-bit
        S = V @ C.T
        vn = np.sqrt((V * V).sum(axis=1))
        return S / np.outer(vn, cn)

    @pandas_udf(T.LongType())
    def assign_cell(vecs):
        S = _cell_sims(vecs)
        # nearest centroid; ties -> lowest centroid id (cids is sorted)
        return pd.Series(cids[np.argmax(S, axis=1)])

    @pandas_udf(T.ArrayType(T.LongType()))
    def probe_cells(vecs):
        S = _cell_sims(vecs)
        order = np.argsort(-S, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(cids[order]))

    cs = spread_for_compute(corpus).select(
        corpus_id, corpus_vec, assign_cell(F.col(corpus_vec)).alias("cell")
    )
    qs = spread_for_compute(queries).select(
        query_id, query_vec, F.explode(probe_cells(F.col(query_vec))).alias("cell")
    )
    cand = (
        qs.join(cs, "cell")
        .where(F.col(corpus_id) != F.col(query_id))
        .select(query_id, F.col(corpus_id).alias("neighbor_id"), query_vec, corpus_vec)
        .dropDuplicates([query_id, "neighbor_id"])
    )
    scored = cand.select(
        F.col(query_id),
        F.col("neighbor_id"),
        F.round(
            _dot(query_vec, corpus_vec) / (_norm(query_vec) * _norm(corpus_vec)), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
