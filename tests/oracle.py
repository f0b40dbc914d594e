"""Pure-Python oracle of the reference semantics (SURVEY §5.1).

Independent reimplementation — no imports from the engine package except
nothing: parsing, selection, budgets, extraction and span assembly are all
re-derived here straight from the reference citations, so engine-vs-oracle
parity is a real two-implementation check.

Covers: P1-P8 parse/normalize, F1-F9 selector (incl. null-field rules from
RecordSelector.java:44-76 and the match-ignores-sample quirk of
MatchSelector.java:40-51), L1-L3 budgets in canonical serial order
(CCFileExtractorRecordProcessor.java:58-112), W1-W5 extraction
(FileFromCCWarcExtractor.java:80-217), and the engine's deterministic
sampling rule + span-assembly rule (mirrored from the documented contract,
not from engine code).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import re
from dataclasses import dataclass, field

# xxhash64 port lives in the package (functions/xxhash.py) so production
# helpers share the same bit-exact implementation; re-exported here for
# the existing oracle API surface.
from commoncrawl_fetcher_lite_spark.functions.xxhash import (  # noqa: F401,E402
    xxh64_bytes,
    xxh64_long,
    xxhash64_spark,
)


def sample_gate_py(value: str, sample: float, clause_id: str, seed: int = 42) -> bool:
    h = abs(xxhash64_spark([value, clause_id, seed]))
    return (h % (1 << 32)) / float(1 << 32) <= sample


# ---------------------------------------------------------------- parsing

KNOWN_KEYS = {
    "url", "mime", "mime-detected", "status", "digest", "length",
    "offset", "filename", "charset", "languages", "truncated", "redirect",
}


def parse_record(line: str) -> dict | None:
    """P1-P3 (CCIndexRecord.parseRecord/tryRepair)."""
    url_i = line.find(" ")
    date_i = line.find(" ", url_i + 1)
    if date_i < 0:
        return None
    tail = line[date_i + 1 :]
    rec = _strict_json(tail)
    if rec is not None:
        return rec
    # repair: substrings ending at each '}', rightmost first
    ends = [i for i, c in enumerate(tail) if c == "}"]
    for e in reversed(ends):
        rec = _strict_json(tail[: e + 1])
        if rec is not None:
            return rec
    return None


def _strict_json(s: str) -> dict | None:
    try:
        obj = json.loads(s)
    except Exception:
        return None
    if not isinstance(obj, dict) or not set(obj) <= KNOWN_KEYS:
        return None
    out = {k: (None if obj.get(k) is None else str(obj[k])) for k in KNOWN_KEYS}
    return out


def normalize_mime(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.lower()
    s = re.sub(r'^"|"$', "", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


def host_of(url: str | None) -> str:
    if url is None:
        return ""
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", url)
    return m.group(1) if m else ""


def commons_extension(val: str) -> str:
    name = val.rsplit("/", 1)[-1]
    if "." not in name:
        return ""
    return name.rsplit(".", 1)[-1]


# ---------------------------------------------------------------- selector


def _field_value(key: str, rec: dict) -> str | None:
    if key == "mime_detected":
        return rec.get("mime-detected")
    if key == "host":
        return host_of(rec.get("url"))
    if key in ("truncated", "mime", "url", "digest", "status"):
        return rec.get(key)
    raise ValueError(f"Don't yet support key {key}")


def _clause_select(val: str, clause: dict, cid: str, seed: int) -> bool:
    if "match" in clause:
        # MatchSelector: sample constructed but never consulted
        if clause.get("case_sensitive", True):
            return val == str(clause["match"])
        return val.lower() == str(clause["match"]).lower()
    if "pattern" in clause:
        if re.search(clause["pattern"], val):
            if "sample" in clause and clause["sample"] is not None:
                return sample_gate_py(val, clause["sample"], cid, seed)
            return True
        return False
    if "extensions" in clause:
        exts = {
            e.strip().lower()
            for e in str(clause["extensions"]).split(",")
            if e.strip()
        }
        ext = commons_extension(val)
        if ext and ext.lower() in exts:
            if "sample" in clause and clause["sample"] is not None:
                return sample_gate_py(val, clause["sample"], cid, seed)
            return True
        return False
    raise ValueError(f"unknown clause {clause}")


def select(rec: dict, selector: dict | None, seed: int = 42) -> bool:
    """RecordSelector.select verbatim (RecordSelector.java:42-84)."""
    if not selector:
        return True
    for fld, clauses in (selector.get("must_not") or {}).items():
        val = _field_value(fld, rec)
        if val is None:
            continue
        for i, cl in enumerate(clauses):
            if _clause_select(val, cl, f"must_not.{fld}.{i}", seed):
                return False
    for fld, clauses in (selector.get("must") or {}).items():
        val = _field_value(fld, rec)
        if val is None:
            return False
        for i, cl in enumerate(clauses):
            if not _clause_select(val, cl, f"must.{fld}.{i}", seed):
                return False
    should = selector.get("should") or {}
    if not should:
        return True
    for fld, clauses in should.items():
        val = _field_value(fld, rec)
        if val is None:
            continue
        for i, cl in enumerate(clauses):
            if _clause_select(val, cl, f"should.{fld}.{i}", seed):
                return True
    return False


# ---------------------------------------------------------------- budgets


@dataclass
class StreamResult:
    records_read: int = 0
    truncated_count: int = 0
    extracted_count: int = 0
    extract_branch: list = field(default_factory=list)  # (seq, line_no, rec)
    trunc_logged: list = field(default_factory=list)
    stopped: bool = False


def process_stream(
    files: list[list[str]],
    selector: dict | None = None,
    max_records: int | None = None,
    max_files_extracted: int | None = None,
    max_files_truncated: int | None = None,
    extract_truncated: bool = False,
    seed: int = 42,
) -> StreamResult:
    """Serial replay of CCFileExtractor worker + RecordProcessor.process,
    numThreads=1 canonical order. `files` = list (in seq order) of the raw
    line lists of each index file."""
    res = StreamResult()
    for seq, lines in enumerate(files):
        line_no = -1
        for raw in lines:
            if raw.strip() == "":
                continue  # blank skipped BEFORE counting
            line_no += 1
            res.records_read += 1
            if max_records is not None and res.records_read >= max_records:
                res.stopped = True
                return res
            rec = parse_record(raw)
            if rec is None:
                continue
            if not select(rec, selector, seed):
                continue
            is_trunc = bool((rec.get("truncated") or "").strip())
            if is_trunc:
                res.truncated_count += 1
                if (
                    max_files_truncated is not None
                    and res.truncated_count >= max_files_truncated
                ):
                    res.stopped = True
                    return res
            if extract_truncated or not is_trunc:
                res.extracted_count += 1
                if (
                    max_files_extracted is not None
                    and res.extracted_count >= max_files_extracted
                ):
                    res.stopped = True
                    return res
                res.extract_branch.append((seq, line_no, rec))
            else:
                res.trunc_logged.append((seq, line_no, rec))
    return res


# ------------------------------------------------------------- extraction


def extract_doc(
    rec: dict, warc_bytes: bytes, pattern: str = "xx/xx/xxx"
) -> dict | None:
    """W1-W5 + span assembly. Returns None for skipped (non-response /
    empty payload) records; else dict with sha256, digest_ok, path, spans."""
    raw = warc_bytes[int(rec["offset"]) : int(rec["offset"]) + int(rec["length"])]
    try:
        data = gzip.decompress(raw)
    except Exception:
        return None
    if not data.startswith(b"WARC/"):
        return None
    he = data.find(b"\r\n\r\n")
    headers = {}
    for ln in data[:he].split(b"\r\n")[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            headers[k.decode().strip().lower()] = v.decode().strip()
    if headers.get("warc-type") != "response":
        return None
    if not headers.get("content-type", "").startswith("application/http"):
        return None
    clen = int(headers["content-length"])
    block = data[he + 4 : he + 4 + clen]
    pe = block.find(b"\r\n\r\n")
    payload = block[pe + 4 :]
    if len(payload) == 0:
        return None  # F13 empty payload skip
    sha256 = hashlib.sha256(payload).hexdigest()
    sha1b32 = base64.b32encode(hashlib.sha1(payload).digest()).decode()
    return {
        "url": rec["url"],
        "sha256": sha256,
        "digest_ok": sha1b32 == rec.get("digest"),
        "path": _rewrite(sha256, pattern),
        "spans": _spans(rec["url"], rec.get("mime-detected"), payload, pattern),
    }


def _rewrite(digest: str, pattern: str) -> str:
    # TargetPathRewriter.java:26-56, independently re-derived
    offsets = []
    hits = 0
    i = pattern.find("/")
    while i > -1:
        offsets.append(i - hits)
        hits += 1
        i = pattern.find("/", i + 1)
    if not offsets:
        return digest
    out = []
    start = 0
    for o in offsets:
        out.append(digest[start:o])
        out.append("/")
        start = o
    out.append(digest)
    return "".join(out)


def _spans(url: str, mime_detected: str | None, payload: bytes, pattern: str) -> list:
    md = (mime_detected or "").lower()
    if md.startswith("text/"):
        spans = []
        for seg in payload.decode("utf-8", errors="replace").split("\n\n"):
            m = re.match(r"^\[\[MEDIA:(\d+)\]\]$", seg)
            if m:
                d = hashlib.sha256(f"{url}#media{m.group(1)}".encode()).hexdigest()
                spans.append(("media", None, _rewrite(d, pattern), len(spans)))
            else:
                spans.append(("text", seg, None, len(spans)))
        return spans
    d = hashlib.sha256(payload).hexdigest()
    return [("media", None, _rewrite(d, pattern), 0)]
