"""Recrawl scoring: turns fetch history into the priority component the
north star names ("priority = recrawl score + host token-bucket state").

Model: a page that changes at rate λ (changes/day) has probability
1 - exp(-λ·age_days) of having changed since its last fetch — the standard
Poisson-change freshness model from the public crawl-scheduling literature
(Cho & Garcia-Molina's freshness work). That probability IS the recrawl
score: 0 right after a fetch, →1 as the page ages, faster for
fast-changing pages. Pure Catalyst (datediff + exp), scan-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def recrawl_score(
    last_fetch_ts: Column | str,
    now: Column,
    change_rate_per_day: Column | float = 0.1,
) -> Column:
    """P(changed since last fetch) = 1 - exp(-λ · age_days), rounded to
    6 dp so cross-engine comparisons are stable."""
    ts = F.col(last_fetch_ts) if isinstance(last_fetch_ts, str) else last_fetch_ts
    lam = (
        F.lit(float(change_rate_per_day))
        if isinstance(change_rate_per_day, (int, float))
        else change_rate_per_day
    )
    age_days = F.datediff(now, ts).cast("double")
    return F.round(1.0 - F.exp(-lam * F.greatest(age_days, F.lit(0.0))), 6)


def with_recrawl_priority(
    history: DataFrame,
    now: Column,
    base_priority_col: str = "priority",
    last_fetch_col: str = "last_fetch_ts",
    change_rate_per_day: float = 0.1,
) -> DataFrame:
    """history(…, priority, last_fetch_ts) → + recrawl_score +
    effective_priority = priority + score (what schedule_batch ranks on)."""
    score = recrawl_score(last_fetch_col, now, change_rate_per_day)
    return history.withColumn("recrawl_score", score).withColumn(
        "effective_priority",
        F.round(F.coalesce(F.col(base_priority_col), F.lit(0.0)) + F.col("recrawl_score"), 6),
    )


def estimate_change_rate(
    fetches: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    digest_col: str = "digest",
    default_rate: float = 0.1,
    max_rate: float = 10.0,
) -> DataFrame:
    """Close the recrawl feedback loop: estimate each URL's change rate λ
    from its own fetch history, instead of the global default the Poisson
    score otherwise runs on.

    Estimator (Cho & Garcia-Molina 2003, "Estimating frequency of
    change" — the bias-corrected MAP form):

        λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / ΔT̄   changes/day

    where n = consecutive-fetch intervals, X = intervals whose content
    digest changed, ΔT̄ = mean interval length in days (datediff — day
    granularity, the recrawl model's unit). Sampling a Poisson process
    only reveals CHANGED/UNCHANGED per interval, so X/n alone
    underestimates fast-changing pages (two changes in one interval
    count once); the -ln correction inverts that censoring, and the
    +0.5 terms keep X = n (every fetch changed) finite.

    Output: (url, n_intervals, n_changes, change_rate[round 6]).
    URLs with < 2 fetches carry `default_rate`; estimates clamp to
    [0, max_rate] (tiny mean intervals explode the division).

    Scale shape: ONE shuffle on url for the lag window — a window
    group is one URL's fetch history (bounded by crawl frequency, ≤
    hundreds of rows even for daily fetches over years; never
    corpus-sized) — then the groupBy(url) aggregate reuses the same
    partitioning (exchange reuse, no second shuffle). The output is
    per-URL and joins the frontier on its key. Feed the result's
    change_rate straight into recrawl_score(..., change_rate_per_day=
    F.col("change_rate")) — it already accepts a per-row Column.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("_ts").asc())
    steps = fetches.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("_ts"),
        F.col(digest_col).alias("_dg"),
    ).select(
        "url",
        F.datediff(F.col("_ts"), F.lag("_ts").over(w))
        .cast("double")
        .alias("_dt"),
        (F.col("_dg") != F.lag("_dg").over(w)).cast("int").alias("_chg"),
    )
    agg = steps.groupBy("url").agg(
        F.count("_dt").alias("n_intervals"),
        F.coalesce(F.sum("_chg"), F.lit(0)).cast("long").alias("n_changes"),
        F.avg("_dt").alias("_avg_dt"),
    )
    lam = -F.log(
        (F.col("n_intervals") - F.col("n_changes") + 0.5)
        / (F.col("n_intervals") + 0.5)
    ) / F.greatest(F.col("_avg_dt"), F.lit(1e-6))
    return agg.select(
        "url",
        "n_intervals",
        "n_changes",
        F.when(F.col("n_intervals") < 1, F.lit(float(default_rate)))
        .otherwise(
            F.round(F.least(F.greatest(lam, F.lit(0.0)), F.lit(float(max_rate))), 6)
        )
        .alias("change_rate"),
    )
