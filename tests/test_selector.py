"""Selector compiler truth table vs the oracle (RecordSelector semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.operators.selector import (
    apply_selector,
    compile_selector,
)
from tests import oracle

# records as (url, mime, mime_detected, status, digest, truncated)
RECORDS = [
    ("https://a.com/x.pdf", "application/pdf", "application/pdf", 200, "D1", None),
    ("https://b.com/y.html", "text/html", "text/html", 200, "D2", "length"),
    ("https://c.com/z.exe", "app/oct", "application/octet-stream", 404, "D3", None),
    ("https://a.com/w.mp4", "video/mp4", "video/mp4", 302, "D4", None),
    ("https://a.com/null", "text/html", None, 200, "D5", None),  # null mime_detected
    ("https://d.com/Q.PDF", "Application/PDF", "application/pdf", 500, "D6", None),
]

SELECTORS = [
    {"must": {"status": [{"match": "200"}]}},
    {"must_not": {"status": [{"match": "200"}]}},
    {"should": {"mime_detected": [{"match": "video/mp4"}, {"match": "text/html"}]}},
    {
        "must": {"status": [{"match": "200"}]},
        "should": {"mime_detected": [{"match": "application/pdf"}]},
    },
    # null-field semantics: must on mime_detected rejects the null row
    {"must": {"mime_detected": [{"match": "text/html"}]}},
    # null-field in must_not: null row is NOT rejected by the clause
    {"must_not": {"mime_detected": [{"match": "text/html"}]}},
    # case-insensitive match
    {"must": {"mime": [{"match": "application/pdf", "case_sensitive": False}]}},
    # regex find-semantics (substring)
    {"must": {"url": [{"pattern": "a\\.com"}]}},
    # extensions clause (commons-io semantics, case-insensitive)
    {"should": {"url": [{"extensions": "exe,pdf"}]}},
    # host field (derived)
    {"must": {"host": [{"match": "a.com"}]}},
    # multiple clauses in one must field = AND
    {"must": {"url": [{"pattern": "https"}, {"pattern": "\\.com"}]}},
    # sampled regex (deterministic gate, seed 42)
    {"should": {"url": [{"pattern": ".", "sample": 0.5}]}},
    # match ignores sample (the MatchSelector quirk)
    {"must": {"status": [{"match": "200", "sample": 0.0}]}},
    # empty selector
    None,
    {},
]


def _oracle_rec(r) -> dict:
    return {
        "url": r[0],
        "mime": r[1],
        "mime-detected": r[2],
        "status": str(r[3]) if r[3] is not None else None,
        "digest": r[4],
        "truncated": r[5],
        "length": None, "offset": None, "filename": None,
        "charset": None, "languages": None, "redirect": None,
    }


@pytest.mark.parametrize("sel_idx", range(len(SELECTORS)))
def test_selector_parity(spark, sel_idx):
    sel = SELECTORS[sel_idx]
    df = spark.createDataFrame(
        RECORDS,
        "url string, mime string, mime_detected string, status int, "
        "digest string, truncated string",
    )
    got = {
        r["url"]
        for r in apply_selector(df, sel, seed=42).select("url").collect()
    }
    want = {
        r[0] for r in RECORDS if oracle.select(_oracle_rec(r), sel, seed=42)
    }
    assert got == want, f"selector {sel!r}: engine={got} oracle={want}"


def test_unknown_field_raises():
    with pytest.raises(ValueError, match="Don't yet support key"):
        compile_selector({"must": {"bogus": [{"match": "x"}]}})


def test_unknown_bucket_raises():
    with pytest.raises(ValueError, match="unknown selector bucket"):
        compile_selector({"mustnt": {"url": [{"match": "x"}]}})


def test_match_ignores_sample_exactly(spark):
    """MatchSelector.java:40-51 builds a sampler but never calls it: a
    match clause with sample=0.0 must still select every matching row."""
    df = spark.createDataFrame([("200",)] * 50, "status string")
    sel = {"must": {"status": [{"match": "200", "sample": 0.0}]}}
    n = df.where(
        compile_selector(sel, columns={"status": F.col("status")})
    ).count()
    assert n == 50
