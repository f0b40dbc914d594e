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


@dataclass(frozen=True)
class FetchConfig:
    """Which byte source serves index files and WARC ranges.

    kind: 'http' | 's3' | 'fs' — reference ExtractorConfig.java:201-220.
    In this sandbox only 'fs' is exercised (local fake WARC store);
    http/s3 share the same ranged-read code path inside the fetch UDF.
    """

    kind: str = "fs"
    base_path: str = ""
    throttle_seconds: tuple[int, ...] = DEFAULT_THROTTLE_SECONDS


@dataclass(frozen=True)
class EmitConfig:
    """Content-addressed emit target (reference ExtractorConfig.java:249-278).

    on_exists='skip' is the reference default — in the engine this dedup is
    enforced relationally (URL-seen / content-seen anti-join) before write.
    """

    kind: str = "fs"
    base_path: str = ""
    on_exists: str = "skip"


@dataclass(frozen=True)
class ExtractorConfig:
    """Top-level job config (reference ExtractorConfig.java:49-66)."""

    index_paths: tuple[str, ...] = ()
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


def from_json_dict(cfg: dict[str, Any]) -> ExtractorConfig:
    """Parse a reference-style config JSON dict (README.md:97-126 shape)."""
    indices = cfg.get("indices", {})
    fetch = FetchConfig(
        kind=cfg.get("fetcher", {}).get("kind", "fs"),
        base_path=cfg.get("fetcher", {}).get("basePath", ""),
        throttle_seconds=tuple(cfg.get("throttleSeconds", DEFAULT_THROTTLE_SECONDS)),
    )
    emit = EmitConfig(
        kind=cfg.get("emitter", {}).get("kind", "fs"),
        base_path=cfg.get("emitter", {}).get("basePath", ""),
        on_exists=cfg.get("emitter", {}).get("onExists", "skip"),
    )
    return ExtractorConfig(
        index_paths=tuple(indices.get("paths", ())),
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
    )
