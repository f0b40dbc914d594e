"""Stateful streaming politeness: the token-bucket quota as a custom
Structured-Streaming stateful operator (applyInPandasWithState).

The batch loop (frontier/scheduler.py) carries host_state through snapshot
tables; this is the SAME rule for continuous ingest, where state lives in
the streaming state store instead: per host,

    avail_i = min(burst + rate·dt, tokens_{i-1} + rate·dt)
    quota_i = min(max_per_batch, floor(avail_i))
    emit the top-quota candidates by (priority desc, url asc)
    tokens_i = avail_i - emitted_i

so a host that drains its bucket in one micro-batch is throttled in the
next — semantics identical to politeness.refill_tokens/debit_tokens (unit
parity is tested), state transport is the only difference.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("host_rank", T.IntegerType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("tokens", T.DoubleType())])


def stateful_host_quota(
    candidates: DataFrame,
    batch_seconds: float = 60.0,
    tokens_per_sec: float = 1.0,
    burst: int = 10,
    max_per_batch: int = 100,
) -> DataFrame:
    """candidates(url, host, priority) stream → per-micro-batch scheduled
    rows with host_rank, token bucket persisted in the state store."""
    cap = float(burst) + tokens_per_sec * batch_seconds

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tokens = state.get[0] if state.exists else float(burst)
        avail = min(cap, tokens + tokens_per_sec * batch_seconds)
        quota = min(max_per_batch, int(avail))
        # bounded hot-host memory: keep a RUNNING top-quota across the
        # chunk iterator instead of pd.concat of every candidate — a host
        # with 10^6 queued URLs holds ≤ quota + chunk rows in memory, the
        # same bound the batch path gets from per-salt pre-truncation
        # (politeness.schedule_batch).
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            part = pdf[["url", "host", "priority"]]
            merged = part if best is None else pd.concat(
                [best, part], ignore_index=True
            )
            best = merged.sort_values(
                ["priority", "url"], ascending=[False, True]
            ).head(quota)
        if best is None:
            best = pd.DataFrame(columns=["url", "host", "priority"])
        state.update((avail - len(best),))
        out = best.copy()
        out["host_rank"] = range(1, len(out) + 1)
        yield out

    return (
        candidates.select("url", "host", "priority")
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
