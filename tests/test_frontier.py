"""Frontier tests: URL-seen exactness (bloom ≡ exact), politeness quotas,
robots, salting equivalence, checkpoint/resume determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.config import FrontierConfig
from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore
from commoncrawl_fetcher_lite_spark.frontier.politeness import (
    apply_robots,
    schedule_batch,
)
from commoncrawl_fetcher_lite_spark.frontier.scheduler import bootstrap, run
from commoncrawl_fetcher_lite_spark.frontier.urlseen import (
    build_bloom,
    filter_unseen,
    with_url_hash,
)


@pytest.fixture(scope="module")
def seeds_df(spark, fixture_t1):
    return spark.read.parquet(f"{fixture_t1.root}/seeds.parquet")


@pytest.fixture(scope="module")
def robots_df(spark, fixture_t1):
    return spark.read.parquet(f"{fixture_t1.root}/robots.parquet")


def test_urlseen_bloom_equals_exact(spark, seeds_df):
    seen = with_url_hash(seeds_df.limit(3000).select("url").distinct())
    cands = seeds_df.select("url", "host").distinct()
    exact = {
        r["url"] for r in filter_unseen(cands, seen).select("url").collect()
    }
    bloom = build_bloom(seen, expected=10_000)
    with_bloom = {
        r["url"]
        for r in filter_unseen(cands, seen, bloom=bloom).select("url").collect()
    }
    assert with_bloom == exact
    # sanity: the filter actually removed things
    assert len(exact) < cands.count()


def test_schedule_quota_respected(spark, seeds_df):
    quotas = spark.createDataFrame(
        [("host000.example.com", 3)], "host string, quota int"
    )
    batch = schedule_batch(
        seeds_df.dropDuplicates(["url"]), quotas, default_quota=7, n_salt=4
    )
    counts = {
        r["host"]: r["n"]
        for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("host000.example.com", 0) <= 3
    assert all(
        n <= 7 for h, n in counts.items() if h != "host000.example.com"
    )


def test_schedule_salting_equivalence(spark, seeds_df):
    """The two-level salted top-k must equal a plain per-host window."""
    from pyspark.sql import Window

    df = seeds_df.dropDuplicates(["url"])
    quotas = spark.createDataFrame([], "host string, quota int")
    salted = schedule_batch(df, quotas, default_quota=5, n_salt=8)
    got = {(r["host"], r["url"]) for r in salted.select("host", "url").collect()}

    prio = F.coalesce(F.col("priority"), F.lit(0.0)) + F.coalesce(
        F.col("recrawl_score"), F.lit(0.0)
    )
    w = Window.partitionBy("host").orderBy(F.desc("_p"), F.asc("url"))
    want = {
        (r["host"], r["url"])
        for r in df.withColumn("_p", prio)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("host", "url")
        .collect()
    }
    assert got == want


def test_robots_filter(spark, robots_df):
    cands = spark.createDataFrame(
        [
            ("https://host001.example.com/private/x", "host001.example.com"),
            ("https://host001.example.com/public/x", "host001.example.com"),
        ],
        "url string, host string",
    )
    # give host001 a disallow on /private/
    robots = spark.createDataFrame(
        [("host001.example.com", ["/private/"], None)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double",
    )
    out = {r["url"] for r in apply_robots(cands, robots).select("url").collect()}
    assert out == {"https://host001.example.com/public/x"}


def test_frontier_loop_and_resume(spark, seeds_df, robots_df, tmp_path):
    """3-iteration run ≡ (2 iterations, new store handle, 1 more) — the
    crash/resume contract: state lives in the snapshot manifest only."""
    cfg = FrontierConfig(n_salt=4, default_max_per_batch=500)
    seeds = seeds_df.limit(2000)

    store_a = SnapshotStore(str(tmp_path / "a"), spark)
    bootstrap(store_a, seeds, robots_df)
    run(store_a, cfg, 3, batch_seconds=60.0)

    store_b = SnapshotStore(str(tmp_path / "b"), spark)
    bootstrap(store_b, seeds, robots_df)
    run(store_b, cfg, 2, batch_seconds=60.0)
    # simulate process death: fresh store handle over the same root
    store_b2 = SnapshotStore(str(tmp_path / "b"), spark)
    assert store_b2.current_snapshot() == 2
    run(store_b2, cfg, 1, batch_seconds=60.0)

    for table in ("urlseen", "frontier"):
        a = {
            tuple(r) for r in store_a.read(table).select("url_hash", "url").collect()
        }
        b = {
            tuple(r) for r in store_b2.read(table).select("url_hash", "url").collect()
        }
        assert a == b, f"{table} diverged after resume"

    # seen set grows monotonically; scheduled batches are disjoint
    b1 = {r["url"] for r in store_a.read_at("batch", 1).collect()}
    b2 = {r["url"] for r in store_a.read_at("batch", 2).collect()}
    b3 = {r["url"] for r in store_a.read_at("batch", 3).collect()}
    assert b1 and b2
    assert not (b1 & b2) and not (b2 & b3) and not (b1 & b3)

    # per-partition lineage + metrics recorded in the manifest
    man = store_a.manifest()
    meta = man["snapshots"]["1"]
    assert meta["metrics"]["scheduled"] == len(b1)
    assert all(
        isinstance(t["lineage"], list) for t in meta["tables"].values()
    )


def test_blocked_bloom_equals_exact(spark, seeds_df):
    """Blocked Bloom (per-block bitmaps, cogrouped probe, no driver OR)
    must produce exactly the exact anti-join result, for several block
    counts including blocks with no seen rows."""
    from commoncrawl_fetcher_lite_spark.frontier.urlseen import (
        build_bloom_blocks,
        filter_unseen_blocked,
    )

    seen = with_url_hash(seeds_df.limit(3000).select("url").distinct())
    cands = seeds_df.select("url", "host").distinct()
    exact = {
        r["url"] for r in filter_unseen(cands, seen).select("url").collect()
    }
    for n_blocks in (1, 4, 64):
        blocks = build_bloom_blocks(seen, n_blocks=n_blocks, expected=10_000)
        got = {
            r["url"]
            for r in filter_unseen_blocked(
                cands, seen, blocks, n_blocks=n_blocks
            ).select("url").collect()
        }
        assert got == exact, f"n_blocks={n_blocks}"
    # bitmaps stay sharded: the 64-block filter has <= 64 rows, each bitmap
    # sized for expected/n_blocks keys (no aggregate anywhere)
    rows = build_bloom_blocks(seen, n_blocks=64, expected=10_000).collect()
    assert 1 <= len(rows) <= 64
    assert all(len(r["bm"]) == rows[0]["m"] // 8 for r in rows)


ROBOTS_BODY = """
# comments everywhere
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2

User-agent: greedybot
Disallow: /

User-agent: ccbot
User-agent: goodbot
Disallow: /no-cc/
Allow: /no-cc/except
Crawl-delay: 0.5
"""


def test_parse_robots_txt_groups():
    from commoncrawl_fetcher_lite_spark.frontier.robots import parse_robots_txt

    # wildcard group
    prefixes, allows, delay = parse_robots_txt(ROBOTS_BODY, agent="*")
    assert prefixes == ["/private/", "/tmp/"] and delay == 2.0
    assert allows == []
    # specific UA beats wildcard; multiple UA lines share one group;
    # Allow lines collect per group
    prefixes, allows, delay = parse_robots_txt(ROBOTS_BODY, agent="CCBot/2.0")
    assert prefixes == ["/no-cc/"] and delay == 0.5
    assert allows == ["/no-cc/except"]
    prefixes, _, _ = parse_robots_txt(ROBOTS_BODY, agent="goodbot")
    assert prefixes == ["/no-cc/"]
    # unknown agents fall back to *
    prefixes, allows, delay = parse_robots_txt(ROBOTS_BODY, agent="whoever")
    assert prefixes == ["/private/", "/tmp/"] and delay == 2.0
    # empty / rule-less bodies
    assert parse_robots_txt("", "x") == ([], [], None)
    assert parse_robots_txt("User-agent: *\nDisallow:", "x") == ([], [], None)


def test_robots_frame_feeds_apply_robots(spark):
    from commoncrawl_fetcher_lite_spark.frontier.politeness import apply_robots
    from commoncrawl_fetcher_lite_spark.frontier.robots import robots_frame

    bodies = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 3"),
            ("b.com", "User-agent: *\nDisallow:"),
        ],
        "host string, robots_txt string",
    )
    robots = robots_frame(bodies, agent="ccbot")
    got = {r["host"]: r for r in robots.collect()}
    assert got["a.com"]["disallow_prefixes"] == ["/blocked/"]
    assert got["a.com"]["crawl_delay_s"] == 3.0
    assert got["b.com"]["disallow_prefixes"] == []

    cands = spark.createDataFrame(
        [
            ("https://a.com/blocked/x", "a.com"),
            ("https://a.com/ok", "a.com"),
            ("https://b.com/anything", "b.com"),
            ("https://c.com/no-robots", "c.com"),
        ],
        "url string, host string",
    )
    kept = {r["url"] for r in apply_robots(cands, robots).collect()}
    assert kept == {
        "https://a.com/ok",
        "https://b.com/anything",
        "https://c.com/no-robots",
    }


def test_crawl_order_matches_python_oracle(spark, tmp_path):
    """North-rule centerpiece: crawl ORDER + URL-seen membership over a
    multi-iteration frontier run must exactly match an independent
    pure-Python simulation of the canonical rule — per host, candidates
    fetch in (effective_priority desc, url asc) order, quota = the host's
    TOKEN BUCKET (floor of min(burst+rate*dt, tokens+rate*dt), debited by
    what was actually scheduled), never revisiting a seen URL, robots
    prefixes excluded.
    """
    import itertools

    from commoncrawl_fetcher_lite_spark.frontier.scheduler import run_iteration

    hosts = [f"h{i}.example.com" for i in range(6)]
    rows = []
    for i, (host, k) in enumerate(itertools.product(hosts, range(12))):
        path = "/blocked/" if k % 4 == 0 else "/p/"
        rows.append(
            (
                f"https://{host}{path}{k}",
                host,
                float((i * 7919) % 13) / 10.0,  # varied, colliding priorities
                None,
                float(k % 3) / 10.0,
            )
        )
    seeds = spark.createDataFrame(
        rows,
        "url string, host string, priority double, "
        "discovered_ts timestamp, recrawl_score double",
    )
    robots = spark.createDataFrame(
        [(h, ["/blocked/"], None) for h in hosts[:3]],
        "host string, disallow_prefixes array<string>, crawl_delay_s double",
    )
    # token bucket: iter1 avail = burst 2 + 0.1*10 = 3 → quota 3; a host
    # that schedules all 3 drains to 0, so iter2 avail = 1 → quota 1; etc.
    BURST, RATE, DT, MAXPB = 2, 0.1, 10.0, 3
    cfg = FrontierConfig(
        n_salt=4,
        default_tokens_per_sec=RATE,
        default_burst=BURST,
        default_max_per_batch=MAXPB,
    )

    store = SnapshotStore(str(tmp_path / "st"), spark)
    bootstrap(store, seeds, robots)
    engine_batches = []
    for _ in range(10):
        res = run_iteration(store, cfg, batch_seconds=10.0)
        if res.n_scheduled == 0:
            break
        engine_batches.append(store.read_at("batch", res.snapshot))

    # engine per-iteration (host → ordered url list) via the fetched table
    # is not persisted with rank; recompute order from the rule on the
    # BATCH SET — per host sort by (prio desc, url) must equal the oracle's
    # emission order, and set membership must match exactly.
    def batch_view(df):
        out = {}
        prio = {r[0]: (r[2] or 0.0) + (r[4] or 0.0) for r in rows}
        by_host = {}
        for r in df.select("url").collect():
            u = r["url"]
            h = u.split("/")[2]
            by_host.setdefault(h, []).append(u)
        for h, us in by_host.items():
            out[h] = sorted(us, key=lambda u: (-prio[u], u))
        return out

    # pure-Python oracle simulation
    prio = {}
    cand_by_host = {}
    blocked_hosts = set(hosts[:3])
    for url, host, p, _ts, rs in rows:
        if host in blocked_hosts and url.split(host, 1)[1].startswith("/blocked/"):
            continue
        prio[url] = (p or 0.0) + (rs or 0.0)
        cand_by_host.setdefault(host, []).append(url)
    seen = set()
    tokens = {h: float(BURST) for h in cand_by_host}
    oracle_batches = []
    while True:
        batch = {}
        for h, urls in cand_by_host.items():
            avail_tokens = min(BURST + RATE * DT, tokens[h] + RATE * DT)
            quota = min(MAXPB, int(avail_tokens))
            emit = sorted(
                (u for u in urls if u not in seen),
                key=lambda u: (-prio[u], u),
            )[:quota]
            if emit:
                batch[h] = emit
            # debit only when the host had candidates this round (the
            # engine's refill covers candidate hosts; others keep state)
            if any(u not in seen for u in urls):
                tokens[h] = avail_tokens - len(emit)
        if not batch:
            break
        for us in batch.values():
            seen.update(us)
        oracle_batches.append(batch)

    assert len(engine_batches) == len(oracle_batches)
    for i, (eng, want) in enumerate(zip(engine_batches, oracle_batches)):
        assert batch_view(eng) == want, f"iteration {i} diverged"

    # URL-seen membership: exactly the union of batches, nothing else
    seen_engine = {r["url"] for r in store.read("urlseen").collect()}
    assert seen_engine == seen


def test_recrawl_score_model(spark):
    """Poisson freshness: score 0 on fetch day, monotone in age, scaled by
    change rate; future-dated fetches clamp to 0."""
    from commoncrawl_fetcher_lite_spark.frontier.recrawl import (
        with_recrawl_priority,
    )

    df = spark.createDataFrame(
        [
            ("u1", 0.5, "2026-01-01 12:00:00"),
            ("u2", 0.5, "2025-12-22 00:00:00"),  # 10 days old
            ("u3", 0.5, "2025-01-01 00:00:00"),  # a year old
            ("u4", 0.5, "2026-06-01 00:00:00"),  # future → clamp
        ],
        "url string, priority double, last_fetch_ts string",
    ).withColumn("last_fetch_ts", F.col("last_fetch_ts").cast("timestamp"))
    out = {
        r["url"]: (r["recrawl_score"], r["effective_priority"])
        for r in with_recrawl_priority(
            df, now=F.lit("2026-01-01").cast("timestamp"), change_rate_per_day=0.1
        ).collect()
    }
    import math

    assert out["u1"][0] == 0.0 and out["u1"][1] == 0.5
    assert abs(out["u2"][0] - round(1 - math.exp(-1.0), 6)) < 1e-9
    assert out["u3"][0] > out["u2"][0] > out["u1"][0]
    assert out["u4"][0] == 0.0  # never negative-age


def test_incremental_snapshot_commits(spark, seeds_df, robots_df, tmp_path):
    """100 TB contract: snapshot N writes O(batch) rows, not O(state) —
    urlseen commits an append delta whose lineage rows equal that
    snapshot's batch size; frontier commits merge-on-read segments instead
    of a full rewrite (VERDICT r2 #1)."""
    cfg = FrontierConfig(n_salt=4, default_max_per_batch=200)
    store = SnapshotStore(str(tmp_path / "st"), spark)
    bootstrap(store, seeds_df.limit(2000), robots_df)
    run(store, cfg, 3, batch_seconds=60.0)

    man = store.manifest()
    for snap in ("1", "2", "3"):
        meta = man["snapshots"][snap]
        seen_entry = meta["tables"]["urlseen"]
        batch_rows = meta["tables"]["batch"]["rows"]
        assert seen_entry["mode"] == "append"
        assert seen_entry["delta_rows"] == batch_rows
        # the lineage scan covers ONLY what this snapshot wrote
        written = sum(e["rows"] for e in seen_entry["lineage"])
        assert written == batch_rows
        assert written < seen_entry["rows"] or snap == "1"

    # cumulative totals stay exact (append disjointness invariant)
    s3 = man["snapshots"]["3"]["tables"]["urlseen"]
    assert s3["rows"] == store.read("urlseen").count()
    # frontier: MOR entry with one delete segment per iteration, exact
    # count while no redirect adds exist
    fr = man["snapshots"]["3"]["tables"]["frontier"]
    assert fr["mode"] == "mor"
    assert len(fr["delete_segments"]) == 3
    assert fr["rows_exact"] and fr["rows"] == store.read("frontier").count()
    # host_state: upsert deltas only for hosts touched that round
    hs = man["snapshots"]["3"]["tables"]["host_state"]
    assert hs["mode"] == "upsert" and len(hs["segments"]) == 3


def test_snapshot_compaction_equivalence(spark, seeds_df, robots_df, tmp_path):
    """Compaction (fold delta chain to a base dir every K segments) must be
    invisible: a compact_every=2 store and a never-compacting store agree
    on every state table after 5 iterations, and the compacted chain stays
    bounded."""
    cfg = FrontierConfig(n_salt=4, default_max_per_batch=100)
    seeds = seeds_df.limit(1200)

    store = SnapshotStore(str(tmp_path / "a"), spark, compact_every=2)
    bootstrap(store, seeds, robots_df)
    results = run(store, cfg, 5, batch_seconds=60.0)

    man = store.manifest()
    modes = [
        man["snapshots"][str(r.snapshot)]["tables"]["urlseen"].get("mode")
        for r in results
    ]
    assert "base" in modes, "compaction never fired"
    for r in results:
        e = man["snapshots"][str(r.snapshot)]["tables"]["frontier"]
        n = len(e.get("segments", [])) + len(e.get("delete_segments", []))
        assert n <= 3, "delta chain unbounded"

    store2 = SnapshotStore(str(tmp_path / "b"), spark, compact_every=10**9)
    bootstrap(store2, seeds, robots_df)
    run(store2, cfg, 5, batch_seconds=60.0)
    for table in ("urlseen", "frontier", "host_state"):
        a = {tuple(r) for r in store.read(table).collect()}
        b = {tuple(r) for r in store2.read(table).collect()}
        assert a == b, f"{table} diverged under compaction"


def test_mor_and_upsert_resolution_semantics(spark, tmp_path):
    """SnapshotStore delta algebra, directly: deletes kill same-key rows
    from OLDER segments only (same-snapshot adds and later re-adds
    survive), duplicate adds resolve oldest-wins, upserts newest-wins with
    untouched keys carried."""
    store = SnapshotStore(str(tmp_path / "st"), spark, compact_every=100)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, u string, v long"
    )
    store.commit(tables={"t": base})

    # snap 1: delete (1,a); add (3,c), a dup of LIVE (2,b), and (9,z) which
    # is both added and deleted in the SAME snapshot (redirect-to-self)
    store.commit(
        mor={
            "t": {
                "add": spark.createDataFrame(
                    [(3, "c", 30), (2, "b", 99), (9, "z", 90)],
                    "k long, u string, v long",
                ),
                "delete": spark.createDataFrame(
                    [(1, "a"), (9, "z")], "k long, u string"
                ),
                "key": ["k", "u"],
            }
        }
    )
    got = {(r["k"], r["u"]): r["v"] for r in store.read("t").collect()}
    assert got == {(2, "b"): 20, (3, "c"): 30, (9, "z"): 90}

    # snap 2: re-add (1,a) AFTER its deletion → re-enters
    store.commit(
        mor={
            "t": {
                "add": spark.createDataFrame([(1, "a", 11)], "k long, u string, v long"),
                "delete": None,
                "key": ["k", "u"],
            }
        }
    )
    got = {(r["k"], r["u"]): r["v"] for r in store.read("t").collect()}
    assert got[(1, "a")] == 11 and got[(2, "b")] == 20

    # upsert table: newest wins, untouched keys carry forward
    store.commit(
        upserts={
            "h": {
                "df": spark.createDataFrame(
                    [("x", 1.0), ("y", 2.0)], "host string, tokens double"
                ),
                "key": ["host"],
            }
        }
    )
    store.commit(
        upserts={
            "h": {
                "df": spark.createDataFrame([("x", 5.0)], "host string, tokens double"),
                "key": ["host"],
            }
        }
    )
    got = {r["host"]: r["tokens"] for r in store.read("h").collect()}
    assert got == {"x": 5.0, "y": 2.0}


def test_robots_allow_longest_match(spark):
    """RFC 9309 precedence: among matching prefixes the longest wins, ties
    go to Allow — the classic `Allow: /public` under `Disallow: /` admits
    /public/* while blocking everything else; a longer Disallow under an
    Allow re-blocks the subtree."""
    from commoncrawl_fetcher_lite_spark.frontier.politeness import apply_robots
    from commoncrawl_fetcher_lite_spark.frontier.robots import robots_frame

    body = (
        "User-agent: *\n"
        "Disallow: /\n"
        "Allow: /public\n"
        "Disallow: /public/secret/\n"
    )
    robots = robots_frame(
        spark.createDataFrame([("a.com", body)], "host string, robots_txt string")
    )
    got = robots.collect()[0]
    assert got["disallow_prefixes"] == ["/", "/public/secret/"]
    assert got["allow_prefixes"] == ["/public"]

    cands = spark.createDataFrame(
        [
            ("https://a.com/", "a.com"),
            ("https://a.com/private/x", "a.com"),
            ("https://a.com/public", "a.com"),
            ("https://a.com/public/doc.html", "a.com"),
            ("https://a.com/public/secret/x", "a.com"),
            ("https://a.com/publicity", "a.com"),  # prefix, not path-segment:
            # RFC prefix semantics admit it via Allow: /public
        ],
        "url string, host string",
    )
    kept = {r["url"] for r in apply_robots(cands, robots).collect()}
    assert kept == {
        "https://a.com/public",
        "https://a.com/public/doc.html",
        "https://a.com/publicity",
    }
    # tie at equal length goes to Allow
    robots_tie = spark.createDataFrame(
        [("b.com", ["/p/"], ["/p/"], None)],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay_s double",
    )
    tie = spark.createDataFrame([("https://b.com/p/x", "b.com")], "url string, host string")
    assert apply_robots(tie, robots_tie).count() == 1


def test_expire_snapshots_gc(spark, seeds_df, robots_df, tmp_path):
    """expire_snapshots drops old manifest entries and deletes their data
    dirs EXCEPT segments still referenced by kept snapshots (delta chains
    and carry-forward bases live under older snap dirs by design): reads
    resolve identically after GC, resume continues, and disk shrinks."""
    import glob
    import os

    cfg = FrontierConfig(n_salt=4, default_max_per_batch=150)
    root = str(tmp_path / "st")
    store = SnapshotStore(root, spark, compact_every=3)
    bootstrap(store, seeds_df.limit(1500), robots_df)
    results = run(store, cfg, 4, batch_seconds=60.0)
    assert len(results) == 4

    def disk() -> int:
        return sum(
            os.path.getsize(p)
            for p in glob.glob(root + "/**/*", recursive=True)
            if os.path.isfile(p)
        )

    before_state = {
        t: {tuple(r) for r in store.read(t).collect()}
        for t in ("urlseen", "frontier", "host_state")
    }
    before_bytes = disk()
    expired = store.expire_snapshots(keep_last=2)
    assert expired == [0, 1, 2]
    assert store.current_snapshot() == results[-1].snapshot
    # every commit recorded its write volume (the O(batch) I/O evidence)
    man = store.manifest()
    assert all(
        man["snapshots"][str(s)]["metrics"]["bytes_written"] > 0
        for s in (3, 4)
    )
    # reads unchanged: referenced segments under expired dirs survived
    for t, want in before_state.items():
        got = {tuple(r) for r in store.read(t).collect()}
        assert got == want, f"{t} changed after expiry"
    assert disk() < before_bytes  # GC actually freed space

    # resume from a FRESH handle over the expired root still works
    store2 = SnapshotStore(root, spark, compact_every=3)
    more = run(store2, cfg, 1, batch_seconds=60.0)
    assert more and more[0].snapshot == results[-1].snapshot + 1


def test_byte_budget_compaction_trigger(spark, tmp_path):
    """VERDICT r3 #6: compaction must also fire on accumulated delta BYTES,
    not only segment count — with huge batches the count gate lets ~8
    batch-sized segments pile up in the read path. compact_bytes=1 folds on
    the first non-trivial delta; resolve metrics surface before that."""
    root = str(tmp_path / "bb")
    store = SnapshotStore(
        root, spark, compact_every=10**9, compact_bytes=1
    )
    d1 = spark.range(50).selectExpr("id as url_hash", "cast(id as string) as url")
    d2 = spark.range(50, 90).selectExpr(
        "id as url_hash", "cast(id as string) as url"
    )
    store.commit(appends={"t": d1})
    man = store.manifest()
    e1 = man["snapshots"]["0"]["tables"]["t"]
    # single segment: no delta yet — stays append mode, metrics recorded
    assert e1["mode"] == "append"
    assert e1["resolve_bytes"] > 0
    assert e1["read_amplification"] == 1.0
    store.commit(appends={"t": d2})
    e2 = store.manifest()["snapshots"]["1"]["tables"]["t"]
    assert e2["mode"] == "base", "byte trigger never compacted"
    got = {r["url_hash"] for r in store.read("t").collect()}
    assert got == set(range(90))

    # count trigger still works independently of bytes
    store2 = SnapshotStore(
        str(tmp_path / "cc"), spark, compact_every=1, compact_bytes=1 << 40
    )
    store2.commit(appends={"t": d1})
    store2.commit(appends={"t": d2})
    assert store2.manifest()["snapshots"]["1"]["tables"]["t"]["mode"] == "base"
    assert {r["url_hash"] for r in store2.read("t").collect()} == set(range(90))


def test_expire_snapshots_orphan_gc(spark, tmp_path):
    """ADVICE r3: a delta segment under an ALREADY-expired snap dir is kept
    while referenced, but once a later compaction supersedes it, a further
    expire must sweep it (the old manifest-ids-only loop leaked it
    forever)."""
    import os

    root = str(tmp_path / "og")
    store = SnapshotStore(root, spark, compact_every=2, compact_bytes=1 << 40)
    d = lambda a, b: spark.range(a, b).selectExpr(  # noqa: E731
        "id as url_hash", "cast(id as string) as url"
    )
    store.commit(appends={"t": d(0, 10)})   # snap 0: seg under snap=0
    store.commit(appends={"t": d(10, 20)})  # snap 1: seg under snap=1
    store.expire_snapshots(keep_last=1)
    # snap=0's segment is still referenced by snapshot 1's delta chain
    assert os.path.isdir(os.path.join(root, "snap=0"))
    store.commit(appends={"t": d(20, 30)})  # snap 2: 3 segs > 2 -> compacts
    assert (
        store.manifest()["snapshots"]["2"]["tables"]["t"]["mode"] == "base"
    )
    store.expire_snapshots(keep_last=1)
    # now nothing references snap=0 or snap=1 — both must be swept
    assert not os.path.exists(os.path.join(root, "snap=0")), "orphan leaked"
    assert not os.path.exists(os.path.join(root, "snap=1")), "orphan leaked"
    assert {r["url_hash"] for r in store.read("t").collect()} == set(range(30))


def test_robots_wildcard_matching(spark):
    """RFC 9309 `*`/`$` wildcards (VERDICT r3 gap #1): `/*.pdf$`,
    mid-pattern `*`, `$` end anchor, wildcard-vs-plain precedence by
    pattern octets, ties to Allow, mid-pattern `$` literal."""
    from commoncrawl_fetcher_lite_spark.frontier.robots import (
        robots_frame,
        rule_to_regex,
        split_rules,
    )

    assert rule_to_regex("/*.pdf$") == r"^/.*\.pdf$"
    assert rule_to_regex("/e/*7") == "^/e/.*7"
    assert rule_to_regex("/a$b") == r"^/a\$b"  # mid-pattern $ is literal
    # trailing-*-only rules stay on the prefix fast path, full octet count
    plain, wild = split_rules(["/foo*", "/bar"], ["/*.gif$"])
    assert plain == [("/foo", 5, False), ("/bar", 4, False)]
    assert wild == [(r"^/.*\.gif$", 7, True)]

    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /private*/data\n"
        "Allow: /private-open/data\n"
        "Disallow: /tmp$\n"
    )
    bodies = spark.createDataFrame(
        [("h.com", body)], "host string, robots_txt string"
    )
    robots = robots_frame(bodies)
    cands = spark.createDataFrame(
        [
            ("https://h.com/a/b.pdf", "h.com"),          # blocked /*.pdf$
            ("https://h.com/a/b.pdf?x=1", "h.com"),      # NOT blocked ($)
            ("https://h.com/report.pdf", "h.com"),       # blocked
            ("https://h.com/private123/data", "h.com"),  # blocked mid-*
            # Allow(19 octets) vs Disallow /private*/data (14): allow wins
            ("https://h.com/private-open/data", "h.com"),
            ("https://h.com/tmp", "h.com"),              # blocked /tmp$
            ("https://h.com/tmp/file", "h.com"),         # NOT blocked ($)
            ("https://h.com/ok", "h.com"),
        ],
        "url string, host string",
    )
    got = {r["url"] for r in apply_robots(cands, robots, broadcast=True).collect()}
    assert got == {
        "https://h.com/a/b.pdf?x=1",
        "https://h.com/private-open/data",
        "https://h.com/tmp/file",
        "https://h.com/ok",
    }


def test_robots_legacy_prefix_frame_still_works(spark):
    """apply_robots must accept pre-wildcard frames (store-persisted robots
    tables without plain_rules/wild_rules) with identical semantics."""
    legacy = spark.createDataFrame(
        [("h.com", ["/e/1"], ["/e/13"], None)],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay_s double",
    )
    cands = spark.createDataFrame(
        [
            ("https://h.com/e/1", "h.com"),
            ("https://h.com/e/13", "h.com"),
            ("https://h.com/e/130", "h.com"),
            ("https://h.com/e/2", "h.com"),
        ],
        "url string, host string",
    )
    got = {r["url"] for r in apply_robots(cands, legacy, broadcast=True).collect()}
    assert got == {
        "https://h.com/e/13",
        "https://h.com/e/130",
        "https://h.com/e/2",
    }


def test_sitemap_urls_extraction(spark):
    from commoncrawl_fetcher_lite_spark.frontier.robots import sitemap_urls

    body_a = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.example.com/sitemap.xml\n"
        "sitemap: http://a.example.com/s2.xml  # trailing comment\n"
        "  SITEMAP:\thttps://a.example.com/sitemap.xml\n"  # dup -> distinct
        "Sitemap: /relative/ignored.xml\n"
        "Sitemap: ftp://a.example.com/nope.xml\n"
    )
    bodies = spark.createDataFrame(
        [("a.example.com", body_a), ("b.example.com", "User-agent: *\nDisallow:")],
        "host string, robots_txt string",
    )
    got = sorted(map(tuple, sitemap_urls(bodies).collect()))
    assert got == [
        ("a.example.com", "http://a.example.com/s2.xml"),
        ("a.example.com", "https://a.example.com/sitemap.xml"),
    ]


def test_update_backoff_mid_rules(spark):
    from commoncrawl_fetcher_lite_spark.frontier.politeness import update_backoff

    prev = spark.createDataFrame(
        [("a.example.com", 8.0), ("idle.example.com", 4.0)],
        "host string, backoff_mult double",
    )
    results = spark.createDataFrame(
        [  # a: 3/4 failed -> doubles; b: 1/4 failed -> halves (no state -> 1)
            ("a.example.com", False), ("a.example.com", False),
            ("a.example.com", False), ("a.example.com", True),
            ("b.example.com", False), ("b.example.com", True),
            ("b.example.com", True), ("b.example.com", True),
        ],
        "host string, success boolean",
    )
    out = {r.host: r for r in update_backoff(prev, results).collect()}
    assert out["a.example.com"].backoff_mult == 16.0
    assert out["a.example.com"].n_failed == 3
    assert out["b.example.com"].backoff_mult == 1.0  # max(1/2, 1)
    # untouched host decays toward 1
    assert out["idle.example.com"].backoff_mult == 2.0
    assert out["idle.example.com"].n_fetched == 0


def test_update_backoff_caps_and_floors(spark):
    from commoncrawl_fetcher_lite_spark.frontier.politeness import update_backoff

    prev = spark.createDataFrame(
        [("x.example.com", 64.0), ("y.example.com", 1.0)],
        "host string, backoff_mult double",
    )
    results = spark.createDataFrame(
        [("x.example.com", False), ("y.example.com", True)],
        "host string, success boolean",
    )
    out = {r.host: r.backoff_mult for r in update_backoff(prev, results).collect()}
    assert out["x.example.com"] == 64.0  # capped
    assert out["y.example.com"] == 1.0  # floored
    import pytest as _pytest

    with _pytest.raises(ValueError):
        update_backoff(prev, results, fail_threshold=0.0)
    with _pytest.raises(ValueError):
        update_backoff(prev, results, max_backoff=0.5)


def test_backoff_wired_into_scheduler(spark, tmp_path):
    """A host whose fetches fail gets its next-iteration quota divided by
    the committed backoff multiplier; a healthy host keeps full quota.
    The multiplier state round-trips through the snapshot store."""
    from commoncrawl_fetcher_lite_spark.config import FrontierConfig
    from commoncrawl_fetcher_lite_spark.frontier import scheduler
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore

    rows = [
        (f"https://{h}/p{i}", h, 1.0, None, 0.0)
        for h in ("bad.example.com", "good.example.com")
        for i in range(12)
    ]
    seeds = spark.createDataFrame(
        rows,
        "url string, host string, priority double, "
        "discovered_ts timestamp, recrawl_score double",
    )
    store = SnapshotStore(str(tmp_path / "snap"), spark)
    scheduler.bootstrap(store, seeds)

    def fetch(batch):
        return batch.select(
            "url", "host", (F.col("host") != "bad.example.com").alias("success")
        )

    # quota 4/iteration: burst 4, and the 4/s refill restores a fully
    # drained bucket within the 1 s batch (avail = min(4+4, 0+4) = 4)
    cfg = FrontierConfig(
        default_burst=4, default_max_per_batch=4, default_tokens_per_sec=4.0
    )
    scheduler.run_iteration(store, cfg, batch_seconds=1.0, fetch_fn=fetch)
    rows = store.read("host_backoff").collect()
    bo = {r.host: r.backoff_mult for r in rows}
    assert bo["bad.example.com"] == 2.0  # 100% failure -> doubled
    # O(batch) contract: ONLY the tripped host gets a state row — the
    # healthy host's (absent) row reads as multiplier 1 via lazy decay
    assert "good.example.com" not in bo
    assert len(rows) == 1
    assert {r.snap_set for r in rows} == {1}

    # iteration 2: bad host's quota 4 // 2 = 2, good host keeps 4
    res = scheduler.run_iteration(store, cfg, batch_seconds=1.0, fetch_fn=fetch)
    batch_hosts = {}
    # count per host in this iteration's batch via the committed batch table
    for r in store.read("batch").collect():
        h = r.url.split("/")[2]
        batch_hosts[h] = batch_hosts.get(h, 0) + 1
    assert batch_hosts["bad.example.com"] == 2
    assert batch_hosts["good.example.com"] == 4
    assert res.n_scheduled == 6
    # multiplier keeps climbing while failures continue
    bo2 = {r.host: r.backoff_mult for r in store.read("host_backoff").collect()}
    assert bo2["bad.example.com"] == 4.0
    # the manifest records the upsert delta: exactly the tripped hosts
    entry = store.manifest()["snapshots"]["2"]["tables"]["host_backoff"]
    assert entry["segments"][-1]["rows"] == 1


def test_backoff_lazy_decay_and_prune(spark, tmp_path):
    """A host that stops failing recovers by LAZY decay — no per-iteration
    state rewrite — and its row is physically dropped when the upsert
    chain compacts (prune predicate). Semantics match the eager halving:
    eff = max(1, mult / 2^(snap - snap_set))."""
    from commoncrawl_fetcher_lite_spark.config import FrontierConfig
    from commoncrawl_fetcher_lite_spark.frontier import scheduler
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore
    from commoncrawl_fetcher_lite_spark.frontier.politeness import (
        effective_backoff,
    )

    rows = [
        (f"https://flaky.example.com/p{i}", "flaky.example.com", 1.0, None, 0.0)
        for i in range(40)
    ]
    seeds = spark.createDataFrame(
        rows,
        "url string, host string, priority double, "
        "discovered_ts timestamp, recrawl_score double",
    )
    store = SnapshotStore(str(tmp_path / "snap"), spark, compact_every=2)
    scheduler.bootstrap(store, seeds)

    fail_once = {"snap": 1}

    def fetch(batch):
        # fail only on iteration 1; healthy afterwards
        ok = store.current_snapshot() + 1 != fail_once["snap"]
        return batch.select("url", "host", F.lit(ok).alias("success"))

    cfg = FrontierConfig(
        default_burst=8, default_max_per_batch=8, default_tokens_per_sec=8.0
    )
    scheduler.run_iteration(store, cfg, batch_seconds=1.0, fetch_fn=fetch)
    st = store.read("host_backoff").collect()
    assert [(r.backoff_mult, r.snap_set) for r in st] == [(2.0, 1)]

    # iteration 2 reads eff = max(1, 2/2^(1-1)) = 2 -> quota 8//2 = 4
    res2 = scheduler.run_iteration(store, cfg, batch_seconds=1.0, fetch_fn=fetch)
    assert res2.n_scheduled == 4
    # healthy iteration wrote NO new backoff rows (delta is tripped-only)
    entry = store.manifest()["snapshots"]["2"]["tables"].get("host_backoff")
    if entry is not None and entry.get("mode") == "upsert":
        assert entry["segments"][-1]["seq"] == 1  # no snap-2 segment
    # effective multiplier at snap 2 decayed to 1 (2/2^(2-1)) -> filtered
    eff = effective_backoff(store.read("host_backoff"), at_snap=2)
    assert eff.count() == 0

    # iteration 3: full quota again (eff decayed to 1)
    res3 = scheduler.run_iteration(store, cfg, batch_seconds=1.0, fetch_fn=fetch)
    assert res3.n_scheduled == 8


def test_bucketed_state_iterations_match_plain(spark, tmp_path):
    """cfg.bucketed_state routes the refill join through the bucketed
    catalog accelerator (base table per compaction generation + broadcast
    delta overlay). Three iterations must schedule EXACTLY the same
    batches as the plain path — the accelerator changes the plan, never
    the semantics — and the catalog must hold one generation at a time."""
    from commoncrawl_fetcher_lite_spark.config import FrontierConfig
    from commoncrawl_fetcher_lite_spark.frontier import scheduler
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore

    rows = [
        (f"https://h{h}.example.com/p{i:03d}", f"h{h}.example.com",
         float(i % 11), None, 0.0)
        for h in range(6)
        for i in range(30)
    ]
    seeds = spark.createDataFrame(
        rows,
        "url string, host string, priority double, "
        "discovered_ts timestamp, recrawl_score double",
    )
    batches = {}
    for flag in (False, True):
        store = SnapshotStore(
            str(tmp_path / f"snap_{flag}"), spark, compact_every=2
        )
        scheduler.bootstrap(store, seeds)
        cfg = FrontierConfig(
            default_burst=4,
            default_max_per_batch=6,
            default_tokens_per_sec=3.0,
            bucketed_state=flag,
        )
        got = []
        for _ in range(3):
            scheduler.run_iteration(store, cfg, batch_seconds=1.0)
            got.append(
                tuple(sorted(r.url for r in store.read("batch").collect()))
            )
        batches[flag] = got
    assert batches[True] == batches[False]
    # one cached generation in the catalog
    gens = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("host_state_bucketed_s")
    ]
    assert len(gens) == 1
    for t in gens:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_backoff_legacy_chain_gains_snap_set(spark, tmp_path):
    """ADVICE r6: a legacy 2-column (host, backoff_mult) backoff chain
    must stay usable after a modern 3-column delta lands on it. The
    merge-on-read union pads legacy rows with NULL snap_set
    (allowMissingColumns — Iceberg schema-evolution semantics), readers
    give NULL the documented legacy meaning (set-at-read: no decay), and
    the prune predicate compacts those rows null-safely instead of
    evaluating to NULL and dropping a still-backed-off host."""
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore
    from commoncrawl_fetcher_lite_spark.frontier.politeness import (
        backoff_prune_predicate,
        effective_backoff,
    )

    store = SnapshotStore(str(tmp_path / "snap"), spark, compact_every=2)
    legacy = spark.createDataFrame(
        [("old.example.com", 8.0)], "host string, backoff_mult double"
    )
    store.commit(upserts={"host_backoff": {"df": legacy, "key": ["host"]}})

    modern = spark.createDataFrame(
        [("new.example.com", 4.0, 1)],
        "host string, backoff_mult double, snap_set int",
    )
    store.commit(
        upserts={
            "host_backoff": {
                "df": modern,
                "key": ["host"],
                "prune": backoff_prune_predicate(1),
            }
        }
    )
    # pre-fix this read threw AnalysisException (strict unionByName over
    # 2-col + 3-col segments)
    rows = {r.host: r for r in store.read("host_backoff").collect()}
    assert rows["old.example.com"].backoff_mult == 8.0
    assert rows["old.example.com"].snap_set is None
    # legacy row: no decay; modern row at snap 3 decayed 4/2^2 = 1 -> out
    eff = {
        r.host: r.backoff_mult
        for r in effective_backoff(
            store.read("host_backoff"), at_snap=3
        ).collect()
    }
    assert eff == {"old.example.com": 8.0}

    # third segment exceeds compact_every=2 -> folds WITH the prune
    # predicate, which pre-fix referenced snap_set unconditionally
    d3 = spark.createDataFrame(
        [("new.example.com", 2.0, 2)],
        "host string, backoff_mult double, snap_set int",
    )
    store.commit(
        upserts={
            "host_backoff": {
                "df": d3,
                "key": ["host"],
                "prune": backoff_prune_predicate(2),
            }
        }
    )
    meta = store.manifest()["snapshots"]["2"]["tables"]["host_backoff"]
    assert meta["mode"] == "base"  # chain folded
    post = {r.host: r for r in store.read("host_backoff").collect()}
    # the legacy host survived its first compaction (mult 8 > 2^0)
    assert post["old.example.com"].backoff_mult == 8.0
    assert post["new.example.com"].backoff_mult == 2.0


def test_backoff_prune_drops_recovered_rows(spark, tmp_path):
    """Upsert compaction with the backoff prune predicate physically
    drops rows whose effective multiplier has decayed to 1."""
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore
    from commoncrawl_fetcher_lite_spark.frontier.politeness import (
        backoff_prune_predicate,
    )

    store = SnapshotStore(str(tmp_path / "snap"), spark, compact_every=1)
    d1 = spark.createDataFrame(
        [("a.example.com", 2.0, 0)],
        "host string, backoff_mult double, snap_set int",
    )
    store.commit(upserts={"host_backoff": {
        "df": d1, "key": ["host"], "prune": backoff_prune_predicate(0)}})
    # second commit (snap 1) exceeds compact_every=1 -> compaction runs
    # the prune: a's eff at snap 1 = max(1, 2/2^(1-0)) = 1 -> dropped;
    # b (freshly tripped, eff 4) survives
    d2 = spark.createDataFrame(
        [("b.example.com", 4.0, 1)],
        "host string, backoff_mult double, snap_set int",
    )
    store.commit(upserts={"host_backoff": {
        "df": d2, "key": ["host"], "prune": backoff_prune_predicate(1)}})
    entry = store.manifest()["snapshots"]["1"]["tables"]["host_backoff"]
    assert entry["mode"] == "base"  # compacted
    rows = store.read("host_backoff").collect()
    assert [(r.host, r.backoff_mult) for r in rows] == [("b.example.com", 4.0)]


def test_blocklist_wired_into_scheduler(spark, tmp_path):
    """A committed `blocklist` table keeps listed domains (and their
    subdomains) out of every scheduled batch; unlisted hosts flow."""
    from commoncrawl_fetcher_lite_spark.config import FrontierConfig
    from commoncrawl_fetcher_lite_spark.frontier import scheduler
    from commoncrawl_fetcher_lite_spark.frontier.checkpoint import SnapshotStore

    seeds = spark.createDataFrame(
        [
            ("https://ok.example.com/1", "ok.example.com", 1.0, None, 0.0),
            ("https://ads.example.net/1", "ads.example.net", 1.0, None, 0.0),
            ("https://sub.ads.example.net/1", "sub.ads.example.net", 1.0, None, 0.0),
        ],
        "url string, host string, priority double, "
        "discovered_ts timestamp, recrawl_score double",
    )
    store = SnapshotStore(str(tmp_path / "snap"), spark)
    scheduler.bootstrap(store, seeds)
    bl = spark.createDataFrame(
        [("ads.example.net", "ads")], "domain string, category string"
    )
    store.commit({"blocklist": bl}, carry_forward=["urlseen", "frontier"])

    res = scheduler.run_iteration(store, FrontierConfig(), batch_seconds=1.0)
    assert res.n_scheduled == 1
    assert [r.url for r in store.read("batch").collect()] == [
        "https://ok.example.com/1"
    ]
    # the gate carries into the next snapshot: blocked hosts remain in the
    # frontier but are never scheduled
    res2 = scheduler.run_iteration(store, FrontierConfig(), batch_seconds=1.0)
    assert res2.n_scheduled == 0
    assert store.exists("blocklist")
    assert store.read("frontier").count() == 2


def test_estimate_change_rate_cho_garcia_molina(spark):
    """λ̂ = -ln((n-X+0.5)/(n+0.5))/ΔT̄ against hand-computed values:
    a static page, a sometimes-changing page, an always-changing page
    (finite via the +0.5 correction), and a single-fetch page falling
    back to the default."""
    import math

    from commoncrawl_fetcher_lite_spark.frontier.recrawl import (
        estimate_change_rate,
    )

    rows = []
    # static: 4 fetches, 2-day spacing, digest never changes
    for i in range(4):
        rows.append(("static", f"2026-01-0{1 + 2 * i}", "d0"))
    # flaky: changes on the 2nd of 3 intervals, 5-day spacing
    for i, dg in enumerate(["a", "a", "b", "b"]):
        rows.append(("flaky", f"2026-01-{1 + 5 * i:02d}", dg))
    # churn: every interval changes, 1-day spacing
    for i in range(4):
        rows.append(("churn", f"2026-01-0{1 + i}", f"d{i}"))
    rows.append(("lone", "2026-01-01", "x"))
    df = spark.createDataFrame(
        rows, "url string, fetch_ts string, digest string"
    ).withColumn("fetch_ts", F.col("fetch_ts").cast("date"))
    got = {
        r["url"]: (r["n_intervals"], r["n_changes"], r["change_rate"])
        for r in estimate_change_rate(df, default_rate=0.25).collect()
    }
    assert got["static"] == (3, 0, round(-math.log(3.5 / 3.5) / 2.0, 6))
    assert got["flaky"] == (3, 1, round(-math.log(2.5 / 3.5) / 5.0, 6))
    assert got["churn"] == (3, 3, round(-math.log(0.5 / 3.5) / 1.0, 6))
    assert got["lone"] == (0, 0, 0.25)
    # estimator ordering: more observed change => higher rate
    assert got["churn"][2] > got["flaky"][2] > got["static"][2]


def test_estimate_change_rate_single_shuffle(spark):
    """The lag window and the per-url aggregate share the url
    partitioning — the plan must contain exactly ONE url-keyed
    Exchange (exchange reuse, no second shuffle)."""
    from commoncrawl_fetcher_lite_spark.frontier.recrawl import (
        estimate_change_rate,
    )

    df = spark.createDataFrame(
        [("u", "2026-01-01", "a"), ("u", "2026-01-02", "b")],
        "url string, fetch_ts string, digest string",
    ).withColumn("fetch_ts", F.col("fetch_ts").cast("date"))
    out = estimate_change_rate(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # formatted plans list each node once as "(k) Exchange"
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 1, plan


def test_parse_sitemap_entries_and_rate_priors(spark):
    """Sitemap XML → per-URL crawl hints: entry order preserved, loc
    trimmed, changefreq case-folded and mapped through CHANGEFREQ_RATES,
    missing/unknown freq → default, entries without <loc> dropped, and
    a <sitemapindex> body yields zero rows."""
    from commoncrawl_fetcher_lite_spark.frontier.robots import (
        CHANGEFREQ_RATES,
        parse_sitemap,
    )

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.com/1 </loc><changefreq>HOURLY</changefreq>"
        "<lastmod>2026-02-03</lastmod><priority>0.9</priority></url>"
        "<url><loc>https://a.com/2</loc><changefreq>never</changefreq></url>"
        "<url><loc>https://a.com/3</loc></url>"
        "<url><changefreq>daily</changefreq></url>"
        "</urlset>"
    )
    idx = "<sitemapindex><sitemap><loc>https://b.com/x.xml</loc></sitemap></sitemapindex>"
    df = spark.createDataFrame(
        [("https://a.com/s.xml", xml), ("https://b.com/s.xml", idx)],
        "sitemap_url string, xml string",
    )
    rows = parse_sitemap(df).collect()
    assert all(r["sitemap_url"] == "https://a.com/s.xml" for r in rows)
    by_no = {r["entry_no"]: r for r in rows}
    assert sorted(by_no) == [0, 1, 2]  # loc-less entry dropped
    assert by_no[0]["loc"] == "https://a.com/1"
    assert by_no[0]["changefreq"] == "hourly"
    assert by_no[0]["change_rate_prior"] == CHANGEFREQ_RATES["hourly"]
    assert by_no[0]["lastmod"] == "2026-02-03"
    assert by_no[0]["priority"] == "0.9"
    assert by_no[1]["change_rate_prior"] == 0.0
    assert by_no[2]["change_rate_prior"] == 0.1  # default
