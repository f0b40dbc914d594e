"""Content-addressed target path rewriting.

Reference: io/TargetPathRewriter.java:26-56. The pattern's '/' positions
(adjusted for previously-seen slashes) are computed once at plan time in
Python; the rewrite itself is a generated concat of substrings — pure
Catalyst, vectorized, no UDF.

Golden cases (TargetPathRewriterTest.java:26-43):
  ('xx/xx',    'abcdefgh') -> 'ab/abcdefgh'
  ('xx/xx/xx', 'abcdefgh') -> 'ab/cd/abcdefgh'
  ('xx/xx/x/xx','abcdefgh')-> 'ab/cd/e/abcdefgh'
  ('xx/xx//xx','abcdefgh') -> 'ab/cd//abcdefgh'
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def target_path_offsets(pattern: str) -> list[int]:
    """Slash offsets of the pattern, each reduced by the count of earlier
    slashes (TargetPathRewriter ctor)."""
    if pattern.startswith("/") or pattern.endswith("/"):
        raise ValueError("targetPathPattern cannot start or end with '/'")
    offsets: list[int] = []
    hits = 0
    i = pattern.find("/")
    while i > -1:
        offsets.append(i - hits)
        hits += 1
        i = pattern.find("/", i + 1)
    return offsets


def rewrite_target_path(digest_col: Column | str, pattern: str) -> Column:
    """Column expression computing the rewritten path for each digest.

    E.g. pattern 'xx/xx/xxx' → concat(substr(d,1,2),'/',substr(d,3,2),'/',d).
    The final segment is always the FULL original digest (reference
    rewrite() appends originalPath whole)."""
    c = F.col(digest_col) if isinstance(digest_col, str) else digest_col
    offsets = target_path_offsets(pattern)
    if not offsets:
        return c
    parts: list[Column] = []
    start = 0
    for i in offsets:
        # substring is 1-based; empty segment when start == i (double slash)
        parts.append(F.substring(c, start + 1, i - start))
        parts.append(F.lit("/"))
        start = i
    parts.append(c)
    return F.concat(*parts)


def rewrite_target_path_py(digest: str, pattern: str) -> str:
    """Pure-Python twin used by the oracle/tests."""
    offsets = target_path_offsets(pattern)
    if not offsets:
        return digest
    out = []
    start = 0
    for i in offsets:
        out.append(digest[start:i])
        out.append("/")
        start = i
    out.append(digest)
    return "".join(out)
