"""URL / mime / string scalar functions as Catalyst Column expressions.

Reference semantics (citations into /root/reference):
  normalize_mime   CCIndexRecord.java:60-68
  host_of          CCIndexRecord.java:154-161 (new URL(url).getHost(); bad -> "")
  tld_of           CCIndexRecord.java:74-103  (URI host last label; digits -> "")
  url_extension    extractor/AbstractRecordProcessor.java getExtension
  clean_string     extractor/AbstractRecordProcessor.java clean (trim, then
                   [\\r\\n\\t] -> space)
All are built-in-function compositions — no Python UDFs — so they stay inside
whole-stage codegen and vectorize for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_mime(col: Column | str) -> Column:
    """lower → strip one wrapping quote each side → collapse whitespace → trim.

    Mirrors CCIndexRecord.normalizeMime exactly, including null passthrough.
    """
    c = _c(col)
    out = F.lower(c)
    out = F.regexp_replace(out, '^"|"$', "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def host_of(col: Column | str) -> Column:
    """Hostname of a URL; '' when unparseable (CCIndexRecord.getHost)."""
    return F.coalesce(F.parse_url(_c(col), F.lit("HOST")), F.lit(""))


def tld_of(col: Column | str) -> Column:
    """Last dot-label of the host; '' if empty host, no dot tail, or all-digit
    (CCIndexRecord.getTLD — INT_PATTERN ^\\d+$)."""
    host = host_of(col)
    tld = F.regexp_extract(host, r"\.([^.]+)$", 1)
    return F.when(tld.rlike(r"^\d+$"), F.lit("")).otherwise(tld)


def url_extension(col: Column | str) -> Column:
    """Reference getExtension: substring after last '.', null when absent or
    longer than 5 chars or all-digits; trimmed, lowercased, one trailing '/'
    stripped. Returns null Column on no-match."""
    c = _c(col)
    # last '.' must be within 6 chars of the end: i + 6 >= len  <=>  ext <= 5 chars
    raw = F.regexp_extract(c, r"\.([^.]{0,5})$", 1)
    ext = F.lower(F.trim(raw))
    ext = F.regexp_replace(ext, r"/$", "")
    bad = (
        (c.isNull())
        | (F.length(c) == 0)
        | (~c.contains("."))
        | (raw == "")  # no match => dot too far from end
        | F.trim(raw).rlike(r"^\d+$")
    )
    return F.when(bad, F.lit(None).cast("string")).otherwise(ext)


def commons_extension(col: Column | str) -> Column:
    """commons-io FilenameUtils.getExtension semantics used by
    ExtensionsSelector.java:47-49: text after the last '.' provided it comes
    after the last '/', else ''. No length cap, no digit guard."""
    c = _c(col)
    name = F.element_at(F.split(c, "/"), -1)
    return F.when(name.contains("."), F.element_at(F.split(name, r"\."), -1)).otherwise(
        F.lit("")
    )


def clean_string(col: Column | str) -> Column:
    """null→'', trim, then CR/LF/TAB → space (AbstractRecordProcessor.clean).

    Note order: the reference trims FIRST, then substitutes — so interior
    newlines become spaces but edge whitespace is gone. Java String.trim
    strips ALL chars <= U+0020 at both ends (Spark's trim only strips
    spaces), so we emulate with a regexp."""
    c = F.coalesce(_c(col), F.lit(""))
    trimmed = F.regexp_replace(c, r"^[\x00-\x20]+|[\x00-\x20]+$", "")
    return F.regexp_replace(trimmed, "[\r\n\t]", " ")


def url_hash(col: Column | str) -> Column:
    """64-bit stable hash of a canonicalized URL — the URL-seen key.

    xxhash64 is JVM-side and identical across executors/runs; at 10^10 URLs
    the collision expectation is ~2.7 (birthday bound 10^20/2^64), and the
    exact urlseen table keeps full URLs so collisions never cause false
    dedup — the hash only buckets."""
    return F.xxhash64(canonicalize_url(_c(col)))


def canonicalize_url(col: Column | str) -> Column:
    """Light canonicalization: trim, strip fragment, lowercase scheme+host,
    drop default ports, remove trailing '/' on empty path. Pure Column ops.

    Every intermediate (fragment-stripped url, scheme, rest, tail) is
    LET-BOUND: projection collapse would otherwise inline the upstream
    regex chain into every downstream reference, re-running ~12 regexes per
    row instead of 6 — measured 2.5x on the URL-seen hashing hot path."""
    from commoncrawl_fetcher_lite_spark.functions.letbind import let

    def _canon(c: Column) -> Column:
        def with_scheme(scheme: Column) -> Column:
            def with_rest(rest: Column) -> Column:
                def with_tail(tail0: Column) -> Column:
                    hostpart = F.regexp_replace(
                        F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1)),
                        r":(80|443)$",
                        "",
                    )
                    tail = F.when(tail0 == "/", F.lit("")).otherwise(tail0)
                    return F.when(
                        scheme != "", F.concat(scheme, F.lit("://"), hostpart, tail)
                    ).otherwise(c)

                return let(F.regexp_replace(rest, r"^[^/?]+", ""), with_tail)

            return let(
                F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""), with_rest
            )

        return let(
            F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)),
            with_scheme,
        )

    return let(F.regexp_replace(F.trim(_c(col)), r"#.*$", ""), _canon)
