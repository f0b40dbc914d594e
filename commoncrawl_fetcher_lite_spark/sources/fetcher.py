"""Byte-range fetchers with the reference's 503 backoff ladder.

Reference semantics (io/BackoffHttpFetcher.java):
  T1 :74-107 — on a throttle-status failure, sleep throttleSeconds[attempt]
     (default [30,120,600,1800] — ExtractorConfig.java:49) and retry; ladder
     exhausted → ThrottleException.
  T2 :63-72 — relative keys prefixed with https://data.commoncrawl.org.

The fetcher runs INSIDE the extraction mapInPandas partition function —
executor-side, per-partition sequential — so a throttling host slows only
its own partition (records are co-partitioned by WARC file). Tests inject a
flaky transport and a fake sleeper; real HTTP/S3 transports plug into
`transport` without touching the retry logic.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from commoncrawl_fetcher_lite_spark.config import CC_HTTPS_BASE, DEFAULT_THROTTLE_SECONDS


class ThrottleException(Exception):
    """Backoff ladder exhausted (io/ThrottleException.java:23)."""


@dataclass
class BackoffFetcher:
    """Ranged reads with retry ladder.

    transport(key, start, end) -> bytes; raise ThrottledError-ish exceptions
    carrying .status == 503 (or message 'bad status code: 503' like the
    reference parses, BackoffHttpFetcher.java:84-92) to trigger backoff."""

    transport: Callable[[str, int | None, int | None], bytes]
    throttle_seconds: tuple[int, ...] = DEFAULT_THROTTLE_SECONDS
    url_base: str = CC_HTTPS_BASE
    sleeper: Callable[[float], None] = time.sleep
    attempts: int = field(default=0, init=False)  # metrics: total retries

    def resolve_key(self, key: str) -> str:
        """T2: relative keys get the CC base prefix."""
        if key.startswith(("http://", "https://", "s3://", "/")):
            return key
        return f"{self.url_base}/{key}"

    def fetch(self, key: str, start: int | None = None, end: int | None = None) -> bytes:
        key = self.resolve_key(key)
        last: Exception | None = None
        for i, _ in enumerate(range(len(self.throttle_seconds) + 1)):
            try:
                return self.transport(key, start, end)
            except Exception as e:  # noqa: BLE001 — classify below
                if not _is_throttle(e):
                    raise
                last = e
                if i >= len(self.throttle_seconds):
                    break
                self.attempts += 1
                self.sleeper(self.throttle_seconds[i])
        raise ThrottleException(str(last))


def _is_throttle(e: Exception) -> bool:
    """Reference parses 'bad status code: (\\d+)' from the exception message
    and backs off on 503 (BackoffHttpFetcher.java:84-92)."""
    status = getattr(e, "status", None)
    if status == 503:
        return True
    import re

    m = re.search(r"bad status code:?\s*\(?(\d+)\)?", str(e))
    return bool(m and m.group(1) == "503")


def local_fs_transport(path_resolver: Callable[[str], str]):
    """Test/fixture transport: ranged reads from local files."""

    def transport(key: str, start: int | None, end: int | None) -> bytes:
        with open(path_resolver(key), "rb") as f:
            if start is None:
                return f.read()
            f.seek(start)
            return f.read((end - start + 1) if end is not None else None)

    return transport
