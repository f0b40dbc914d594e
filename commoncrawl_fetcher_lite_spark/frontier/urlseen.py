"""URL-seen set: partitioned Bloom prefilter + exact anti-join.

North-rule scale target is a 10^10-entry seen set. Design:

  * exact truth: `urlseen` table (url_hash bigint, url string), hash-
    partitioned/bucketed by url_hash. At 10^10 rows × ~90 B this is ~1 TB of
    parquet — fine for a cluster, queried only via hash-bucketed anti-join.
  * fast path: per-partition Bloom filter blocks built with Spark's native
    `bloom_filter_agg` (SQL, Spark 3.3+), stored as (block_id, bitmap).
    Probing uses `might_contain`: definite-negatives skip the anti-join
    entirely; only filter-positives (fpp ≈ 1%) hit the exact table.
    This reproduces the emitter's onExists=skip dedup
    (ExtractorConfig.java:276) relationally, and makes it exact — the
    reference's skip is per-object-store-key, racy across workers.

The Bloom path is an OPTIMIZATION gate in front of the exact anti-join; the
anti-join alone is always correct (tests assert bloom+exact ≡ exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.functions.urls import url_hash


def with_url_hash(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("url_hash", url_hash(F.col(url_col)))


def build_bloom(seen: DataFrame, expected: int = 1_000_000, fpp: float = 0.01):
    """Aggregate the seen-set's url_hash into one Bloom bitmap (driver-held
    bytes). At 10^10 scale this becomes per-bucket blocks: groupBy(pmod(
    url_hash, n_blocks)) + bloom_filter_agg per block, kept as a table and
    joined on the same pmod — the code path is identical, block count 1 here
    because local test sets are small."""
    row = seen.select(
        F.expr(
            f"bloom_filter_agg(url_hash, cast({expected} as long), "
            f"cast({int(expected * 10)} as long))"
        ).alias("bloom")
    ).collect()[0]
    return row["bloom"]


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: bytes | None = None,
    url_col: str = "url",
) -> DataFrame:
    """candidates minus seen (exact), with optional Bloom pre-gate.

    Both sides join on url_hash (bigint) — at scale the anti-join shuffles
    8-byte keys, not URL strings; the exact table is bucketed by the same
    key so the join is co-partitioned."""
    cand = with_url_hash(candidates, url_col)
    if bloom is not None:
        spark = candidates.sparkSession
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        bloom_df = spark.createDataFrame([(bytearray(bloom),)], "bloom binary")
        cand = (
            cand.crossJoin(F.broadcast(bloom_df))
            .withColumn("maybe_seen", F.expr("might_contain(bloom, url_hash)"))
            .drop("bloom")
        )
        negatives = cand.where(~F.col("maybe_seen")).drop("maybe_seen")
        positives = cand.where(F.col("maybe_seen")).drop("maybe_seen")
        checked = positives.join(
            seen.select("url_hash").distinct(), "url_hash", "left_anti"
        )
        return negatives.unionByName(checked)
    return cand.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")


def update_seen(seen: DataFrame, newly_fetched: DataFrame, url_col: str = "url") -> DataFrame:
    add = with_url_hash(newly_fetched.select(F.col(url_col).alias("url")))
    return seen.unionByName(add.select("url_hash", "url")).dropDuplicates(["url_hash", "url"])
