"""Join-side size gating.

The politeness/frontier joins carry one row per *host* (robots, host_state,
host_budget, quotas). At test scale those are a few thousand rows and should
broadcast; at CC scale they are 10^7-10^8 rows (robots.py:20-22) and a forced
``F.broadcast`` would materialize multi-GB tables on the driver and every
executor. ``maybe_broadcast`` hints broadcast ONLY when Catalyst statistics
*prove* the frame is under the session's ``autoBroadcastJoinThreshold``;
otherwise it returns the frame unhinted, so the planner picks a shuffle join
statically and AQE may still convert to broadcast at runtime if the actual
size turns out small (the Spark-idiomatic escape hatch for frames with
unknown stats, e.g. ``createDataFrame`` inputs in unit tests).

Stats fidelity on this Spark build (measured): parquet scans report summed
file size, ``localCheckpoint``-ed frames report row-based estimates, local
in-memory frames report unknown (Long.MaxValue) — so every store-backed
frame in the frontier loop gets an accurate gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNKNOWN = (1 << 63) - 1  # Catalyst's defaultSizeInBytes sentinel


def _parse_size(conf_val: str) -> int:
    """Parse spark size confs like '10485760', '10485760b', '64MB', '-1'."""
    s = conf_val.strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for the optimized plan; _UNKNOWN when
    statistics are unavailable (never raises — classic-mode only API)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(stats.sizeInBytes().toString())
    except Exception:  # noqa: BLE001 — connect mode / API drift: stay unhinted
        return _UNKNOWN


def is_empty_local_relation(df: DataFrame) -> bool:
    """True iff the frame's optimized plan is a provably-empty
    LocalRelation (e.g. ``createDataFrame([], schema)``). Plan-time only —
    never runs a job. Lets join sites skip a dimension join entirely when
    the dim is empty BY CONSTRUCTION: a left join against an empty frame
    contributes all-null columns, so the caller can substitute the
    coalesce defaults as literals — which keeps downstream rank filters
    literal and eligible for WindowGroupLimit pushdown (guide §2.4: remove
    shuffles/sorts the data doesn't need)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        name = plan.getClass().getSimpleName()
        if name == "LocalRelation":
            return bool(plan.data().isEmpty())
        # createDataFrame([], schema) parallelizes an empty list → a LEAF
        # LogicalRDD. For leaves only, a bounded isEmpty() probe (limit-1
        # scan over already-local partitions, milliseconds) settles it;
        # derived frames (Project/Filter/... on top) never take this probe,
        # so store-backed dimension tables cost nothing here.
        if name == "LogicalRDD" and plan.children().isEmpty():
            return bool(df.isEmpty())
        return False
    except Exception:  # noqa: BLE001 — connect mode / API drift: keep the join
        return False


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast hint iff stats prove df <= max_bytes (default: the session's
    spark.sql.autoBroadcastJoinThreshold). Unknown-size or over-threshold
    frames return unhinted → shuffle join statically, AQE runtime-converts
    small ones."""
    if max_bytes is None:
        raw = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760b"
        )
        max_bytes = _parse_size(raw)
    if max_bytes <= 0:  # user disabled broadcast joins entirely
        return df
    if plan_size_bytes(df) <= max_bytes:
        return F.broadcast(df)
    return df
