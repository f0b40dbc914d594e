"""Plan-shape guardrails: the physical-plan properties the 100 TB design
depends on, asserted so a refactor can't silently regress them.

These are the things `.explain("formatted")` reviews check by hand:
filters/projections reach the parquet scan, small dims broadcast, the
scan-side hot path has no Exchange, and the selector predicate compiles to
a pure Column (no Python in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_pushdown_and_pruning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: text (the wide column) must NOT be read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema and "doc_id" in read_schema


def test_scan_hot_path_has_no_exchange(spark):
    """canonicalize+hash+filter (the per-URL scan work) must stay map-only:
    one pipeline, zero shuffles."""
    from commoncrawl_fetcher_lite_spark.frontier.urlseen import with_url_hash

    seeds = spark.range(1000).select(
        F.concat(F.lit("https://h"), F.col("id").cast("string")).alias("url")
    )
    plan = _plan(with_url_hash(seeds).where(F.col("url_hash") % 10 != 0))
    assert "Exchange" not in plan
    assert "codegen id" in plan  # formatted-mode WholeStageCodegen marker


def test_small_dims_broadcast(spark):
    """join_revenue's customer dim must broadcast (no shuffle of the fact
    side for that join)."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_join_revenue(spark, "/root/testdata/sf0.01"))
    assert "BroadcastHashJoin" in plan


def test_selector_compiles_to_pure_column(spark):
    """The selector predicate must contain no Python evaluation — it gates
    rows BEFORE the fetch UDF, so it has to be JVM-side."""
    from commoncrawl_fetcher_lite_spark.operators.selector import apply_selector

    df = spark.createDataFrame(
        [("https://a/x.pdf", "application/pdf", "200", None)],
        "url string, mime_detected string, status string, truncated string",
    )
    sel = {
        "must": {"status": [{"match": "200"}]},
        "should": {"mime_detected": [{"pattern": "pdf", "sample": 0.5}]},
    }
    plan = _plan(apply_selector(df, sel))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_frontier_antijoin_is_hash_keyed(spark):
    """URL-seen anti-join plan: join keys include the 8-byte url_hash (the
    co-partitioning key at scale)."""
    from commoncrawl_fetcher_lite_spark.frontier.urlseen import (
        filter_unseen,
        with_url_hash,
    )

    seeds = spark.range(1000).select(
        F.concat(F.lit("https://h"), F.col("id").cast("string")).alias("url")
    )
    seen = with_url_hash(
        spark.range(0, 1000, 3).select(
            F.concat(F.lit("https://h"), F.col("id").cast("string")).alias("url")
        )
    )
    plan = _plan(filter_unseen(seeds, seen))
    assert "LeftAnti" in plan and "url_hash" in plan
