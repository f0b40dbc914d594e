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
