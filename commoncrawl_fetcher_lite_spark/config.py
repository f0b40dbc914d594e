"""Engine configuration mirroring the reference's ExtractorConfig semantics.

Defaults match /root/reference .../extractor/ExtractorConfig.java:49-66:
  throttleSeconds = [30, 120, 600, 1800]   (:49)
  numThreads      = 2                      (:50)
  maxRecords / maxFilesExtracted / maxFilesTruncated = unbounded (:52-54)
  dryRun = False, extractTruncated = False (:55-56)
  targetPathPattern default ''             (:58)
  RecordSelector.ACCEPT_ALL when no selector (:66)

The engine adds frontier/politeness knobs the reference lacks (required by
the north rule): per-host token buckets, salting, deterministic sampling
seed, checkpoint root.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

LONG_MAX = (1 << 63) - 1

# Reference constants (ExtractorConfig.java:41-49, BackoffHttpFetcher usage)
DEFAULT_THROTTLE_SECONDS = (30, 120, 600, 1800)
CC_HTTPS_BASE = "https://data.commoncrawl.org"  # ExtractorConfig.java:41-45
CC_S3_BUCKET = "commoncrawl"
CC_REGION = "us-east-1"


DEFAULT_FS_DOCS_PATH = "docs"  # ExtractorConfig.java:47


@dataclass(frozen=True)
class FetchConfig:
    """Which byte source serves index files and WARC ranges.

    Kind resolution mirrors ExtractorConfig.FetchConfig.newFetcher
    (ExtractorConfig.java:201-220) precedence exactly:
      profile set  → 's3'  (S3Fetcher: bucket=commoncrawl, region=us-east-1)
      basePath set → 'fs'  (FileSystemFetcher)
      else         → 'http' (BackoffHttpFetcher with throttleSeconds)
    """

    kind: str = "http"
    base_path: str = ""
    profile: str = ""
    bucket: str = CC_S3_BUCKET
    region: str = CC_REGION
    throttle_seconds: tuple[int, ...] = DEFAULT_THROTTLE_SECONDS

    @staticmethod
    def from_dict(d: dict[str, Any] | None) -> "FetchConfig":
        d = d or {}
        throttle = tuple(d.get("throttleSeconds", DEFAULT_THROTTLE_SECONDS))
        if d.get("profile"):
            return FetchConfig(
                kind="s3", profile=d["profile"], throttle_seconds=throttle
            )
        if d.get("basePath"):
            return FetchConfig(
                kind="fs", base_path=d["basePath"], throttle_seconds=throttle
            )
        return FetchConfig(kind="http", throttle_seconds=throttle)


@dataclass(frozen=True)
class EmitConfig:
    """Content-addressed emit target (reference EmitConfig.newEmitter,
    ExtractorConfig.java:249-278):
      profile non-blank → 's3' (S3Emitter: bucket REQUIRED, region default
                          us-east-1, optional prefix, empty file extension)
      else              → 'fs' (FileSystemEmitter: path or 'docs',
                          onExists=skip)

    on_exists='skip' is the reference default — in the engine this dedup is
    also enforced relationally (URL-seen / content-seen anti-join) before
    write; the sink-level skip stays as the idempotency backstop.
    """

    kind: str = "fs"
    base_path: str = ""
    profile: str = ""
    region: str = CC_REGION
    bucket: str = ""
    prefix: str = ""
    on_exists: str = "skip"

    @staticmethod
    def from_dict(d: dict[str, Any] | None) -> "EmitConfig":
        """Absent 'docs' → fs sink with NO base path (the engine's fetch
        pipeline then skips the sink write; its outputs are the relational
        tables). This diverges from the reference, which always emits and
        defaults the path to 'docs' (ExtractorConfig.java:271-273) — a
        present-but-pathless docs dict keeps that default."""
        if d is None:
            return EmitConfig()
        if d.get("profile"):
            bucket = d.get("bucket", "")
            if not bucket:
                # reference: TikaConfigException("Must specify a bucket for
                # docs"), ExtractorConfig.java:255-257
                raise ValueError("Must specify a bucket for docs")
            return EmitConfig(
                kind="s3",
                profile=d["profile"],
                region=d.get("region") or CC_REGION,
                bucket=bucket,
                prefix=d.get("prefix", ""),
            )
        return EmitConfig(
            kind="fs",
            base_path=d.get("path") or DEFAULT_FS_DOCS_PATH,
            on_exists=d.get("onExists", "skip"),
        )


@dataclass(frozen=True)
class ExtractorConfig:
    """Top-level job config (reference ExtractorConfig.java:49-66)."""

    index_paths: tuple[str, ...] = ()
    # indices.basePath / indices.profile (IndexIterator.java:66-78): where
    # the index files themselves are fetched from (fs dir-walk vs s3)
    index_base_path: str = ""
    index_profile: str = ""
    # 'indexFetcher' (ExtractorConfig.java:164-169): separate transport for
    # index files; defaults to the HTTP fetcher like the reference
    index_fetch: FetchConfig = None  # type: ignore[assignment]
    # numThreads (ExtractorConfig.java:50, reference default 2): the engine
    # analog is the fetch STAGE's task count. -1 = absent from the config;
    # resolution (effective_fetch_cap, ADVICE r4): absent + HTTP transport
    # -> cap 2, matching the reference's external-load behavior toward the
    # Common Crawl origin (its README advises ~3 http connections); absent
    # + S3/fs transport -> uncapped (those scale with the cluster and the
    # reference's "2" merely sized one box's worker pool). 0 = explicit
    # uncapped opt-in for HTTP too. >0 = that cap, any transport.
    num_threads: int = -1
    selector: dict[str, Any] | None = None
    max_records: int = LONG_MAX
    max_files_extracted: int = LONG_MAX
    max_files_truncated: int = LONG_MAX
    max_index_files: int = LONG_MAX
    dry_run: bool = False
    extract_truncated: bool = False
    target_path_pattern: str = ""
    fetch: FetchConfig = field(default_factory=FetchConfig)
    emit: EmitConfig = field(default_factory=EmitConfig)
    # Engine-only: deterministic sampling seed (reference sampling is
    # unseeded java.util.Random — AbstractSamplingSelector.java:40-55 —
    # and cannot reproduce its own runs; we fix that).
    sample_seed: int = 42
    # T4 (CCFileExtractor.java:150-153): the reference's worker loop gives
    # up after a 120-minute queue-poll timeout. Engine analog: a per-task
    # fetch deadline — past it, remaining records surface as
    # read_error='deadline_exceeded' rows instead of hanging the task.
    fetch_deadline_seconds: float = 7200.0


@dataclass(frozen=True)
class FrontierConfig:
    """Net-new frontier knobs (north rule; no reference analog)."""

    n_salt: int = 16  # salt buckets per hot host
    default_tokens_per_sec: float = 1.0
    default_burst: int = 10
    default_max_per_batch: int = 100
    bloom_expected_items: int = 10_000_000  # per partition block
    bloom_fpp: float = 0.01
    checkpoint_root: str = ""
    # Shuffle-byte diet for the scheduling hot path (frontier/diet.py):
    # anti-join + top-k windows on the 24 B skinny frame, late payload
    # join. With the frontier's real shape (stored url_hash — bootstrap
    # always writes it) the diet measured FASTEST at every parallelism
    # level (1.9x exact at 2 cores, 1.45x at 8; 6 quiet pinned pairs,
    # BENCH/BASELINE.md), and on a multi-node cluster the shuffle-byte
    # cut only grows. It stays OPT-IN for one reason: its priority-tie
    # break is (prio, url_hash) while the north rule's reference-matching
    # crawl order is (prio, url asc) — identical batches whenever
    # priorities are distinct (tested, incl. through the full snapshot
    # loop), divergent only on exact priority ties. Other documented
    # trade-offs: hash-only anti-join, host-hash windows, and token
    # refill over PRE-seen-filter hosts (a benign host_state superset —
    # an unscheduled refilled host converges to the same avail as a
    # fresh one).
    compact_shuffles: bool = False
    # Bucketed host_state reads (frontier/bucketed.py): materialize the
    # state's compacted BASE segment as a bucketed catalog table once per
    # compaction generation and overlay the (O(batch)-sized) upsert delta
    # as a broadcast — the refill join then plans zero Exchange above the
    # state scan. At steady state host_state holds every host ever
    # scheduled, so the per-iteration state shuffle this removes is the
    # loop's second-largest after the seen anti-join (which the bucketed
    # urlseen machinery already covers). OPT-IN because the rewrite
    # needs a writable catalog + path (checkpoint root) and only pays
    # once state ≫ batch.
    bucketed_state: bool = False
    # Weight of the link-graph centrality prior: when a `host_rank`
    # snapshot table exists (frontier/hostrank.py host_pagerank over the
    # outlink graph), candidate priority becomes
    # priority + host_rank_weight * rank(host). Inert without the table.
    host_rank_weight: float = 1.0


def _normalize_emit_dict(cfg: dict[str, Any]) -> dict[str, Any] | None:
    """Resolve the emit sink dict: modern 'docs' (reference key,
    ExtractorConfig.java:249) wins; the legacy 'emitter' fallback is
    TRANSLATED to the modern keys (basePath → path; onExists carried) so
    old configs keep their target dir and overwrite mode instead of
    silently emitting to the default 'docs' dir."""
    if cfg.get("docs") is not None:
        return cfg["docs"]
    legacy = cfg.get("emitter")
    if legacy is None:
        return None
    d = dict(legacy)
    if "basePath" in d and "path" not in d:
        d["path"] = d.pop("basePath")
    return d


def effective_fetch_cap(cfg: "ExtractorConfig", transport_is_http: bool) -> int | None:
    """Resolve numThreads into the fetch stage's task cap (None = uncapped).

    ADVICE r4 policy: a config that OMITS numThreads keeps the reference's
    modest courtesy cap (2, ExtractorConfig.java:50) when the bytes come
    from the HTTP origin — existing reference configs then produce the
    same external load they always did — while S3/fs transports run at
    cluster width (the reference's "2" only sized one box's worker pool).
    Explicit numThreads=0 opts HTTP out of the cap; explicit >0 caps any
    transport."""
    if cfg.num_threads > 0:
        return cfg.num_threads
    if cfg.num_threads == 0:
        return None
    return 2 if transport_is_http else None


def from_json_dict(cfg: dict[str, Any]) -> ExtractorConfig:
    """Parse a reference-style config JSON dict (README.md:97-126 shape;
    fetcher/docs resolution per ExtractorConfig.java:157-278 — see the
    reference's own three test resources configs/basic-{http,local,s3}.json
    exercised by FetcherConfigTest.java:36-62)."""
    indices = cfg.get("indices", {})
    fetch = FetchConfig.from_dict(cfg.get("fetcher"))
    emit = EmitConfig.from_dict(_normalize_emit_dict(cfg))
    return ExtractorConfig(
        index_paths=tuple(indices.get("paths", ())),
        index_base_path=indices.get("basePath", ""),
        index_profile=indices.get("profile", ""),
        index_fetch=FetchConfig.from_dict(cfg.get("indexFetcher")),
        num_threads=int(cfg.get("numThreads", -1)),  # absent = sentinel -1
        selector=cfg.get("recordSelector"),
        max_records=int(cfg.get("maxRecords", LONG_MAX)),
        max_files_extracted=int(cfg.get("maxFilesExtracted", LONG_MAX)),
        max_files_truncated=int(cfg.get("maxFilesTruncated", LONG_MAX)),
        max_index_files=int(cfg.get("maxIndexFiles", LONG_MAX)),
        dry_run=bool(cfg.get("dryRun", False)),
        extract_truncated=bool(cfg.get("extractTruncated", False)),
        target_path_pattern=str(cfg.get("targetPathPattern", "")),
        fetch=fetch,
        emit=emit,
        sample_seed=int(cfg.get("sampleSeed", 42)),
        fetch_deadline_seconds=float(cfg.get("fetchDeadlineSeconds", 7200.0)),
    )
