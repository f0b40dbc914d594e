"""CountMimes — the reference's analytics query (extractor/CCMimeCounter.java).

Reference: per-thread HashMap partial counts of normalized mime_detected for
all records and for truncated records (:306-368), merged at the end
(:143-155), non-truncated derived by difference (:157-165), reports sorted
desc by count (:167-185).

Engine: one groupBy with conditional aggregates — Catalyst plans the partial
(map-side) + final hash aggregation the reference hand-rolled, in a single
shuffle of (mime, partial counts) pairs. The difference (A3) folds into the
same pass, no join needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.functions.urls import normalize_mime


def count_mimes(
    records: DataFrame,
    selected: Column | None = None,
    mime_col: str = "mime_detected",
) -> DataFrame:
    """→ (mime, total, truncated, non_truncated) sorted desc by total.

    `truncated` uses the reference's isBlank test (null or '' ⇒ not
    truncated — CCMimeCounter.java:343-353)."""
    df = records if selected is None else records.where(selected)
    is_trunc = F.coalesce(F.col("truncated"), F.lit("")) != ""
    return (
        df.withColumn("mime", normalize_mime(F.col(mime_col)))
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(is_trunc, 1).otherwise(0)).alias("truncated"),
        )
        .withColumn("non_truncated", F.col("total") - F.col("truncated"))
        .orderBy(F.desc("total"), F.asc("mime"))
    )
