"""Parse/budget edge cases pinned against the oracle: malformed lines,
trailing-line drops vs per-file counts, path validation."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.operators.budgets import apply_budgets
from commoncrawl_fetcher_lite_spark.sources.cdx import (
    expand_index_paths,
    parse_cdx,
    read_cdx_lines,
)
from tests import oracle

GOOD = (
    'com,a)/{i} 20230101120000 {{"url": "https://a.com/{i}", '
    '"mime-detected": "text/html", "status": "200", "digest": "D", '
    '"length": "10", "offset": "0", "filename": "f.warc.gz"}}'
)


def _write_gz(path: str, lines: list[str]) -> None:
    with gzip.GzipFile(path, "wb", mtime=0) as gz:
        gz.write(("\n".join(lines) + "\n").encode())


@pytest.fixture()
def edge_file(tmp_path):
    lines = [
        GOOD.format(i=0),
        "nospacesatall",  # P1 drop (no 2nd space)
        "one space_only_here",  # P1 drop (no 2nd space after first)
        GOOD.format(i=1) + " trailing garbage",  # P3 repairable
        'com,a)/x 20230101120000 {"url": "u", "unknown-key": "v"}',  # strict drop (unknown key, no repair possible)
        "   ",  # blank — skipped pre-count
        'com,a)/y 20230101120000 {broken json',  # unparseable drop
        GOOD.format(i=2),
    ]
    p = str(tmp_path / "cdx-00000.gz")
    _write_gz(p, lines)
    return p, lines


def test_parse_edge_lines(spark, edge_file):
    p, lines = edge_file
    recs = parse_cdx(read_cdx_lines(spark, [p])).collect()
    got = {(r["line_no"], r["url"]) for r in recs}
    # oracle: enumerate non-blank lines, parse each
    want = set()
    ln = -1
    for raw in lines:
        if raw.strip() == "":
            continue
        ln += 1
        rec = oracle.parse_record(raw)
        if rec is not None and rec["url"] is not None:
            want.add((ln, rec["url"]))
    assert got == want
    assert {u for _, u in got} == {
        "https://a.com/0", "https://a.com/1", "https://a.com/2"
    }


def test_budget_counts_dropped_lines(spark, edge_file):
    """maxRecords counts parse-dropped lines too (counter increments before
    parse — CCFileExtractorRecordProcessor.java:60-67)."""
    p, lines = edge_file
    recs = read_cdx_lines(spark, [p])
    n_lines = {
        r["index_file_seq"]: r["n"]
        for r in recs.groupBy("index_file_seq").agg(F.count("*").alias("n")).collect()
    }
    parsed = parse_cdx(recs)
    # max_records=5: lines 0..3 processed (5th non-blank line trips)
    out = apply_budgets(
        parsed, F.lit(True), max_records=5, per_file_lines=n_lines
    )
    got = {r["line_no"] for r in out.collect()}
    ores = oracle.process_stream([lines], selector=None, max_records=5)
    want = {ln for _, ln, _ in ores.extract_branch}
    assert got == want


def test_validate_literal_paths(tmp_path):
    good = str(tmp_path / "indexes" / "cdx-00001.gz")
    os.makedirs(os.path.dirname(good), exist_ok=True)
    _write_gz(good, ["x"])
    assert expand_index_paths([good], validate_literal=True) == [good]
    bad = str(tmp_path / "indexes" / "other.gz")
    _write_gz(bad, ["x"])
    with pytest.raises(ValueError, match="invalid index path"):
        expand_index_paths([bad], validate_literal=True)
