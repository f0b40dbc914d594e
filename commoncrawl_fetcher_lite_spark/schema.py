"""Explicit StructTypes for every engine table.

The reference binds CDX JSON into a 12-field POJO with all-nullable fields
(CCIndexRecord.java:47-58); the JSON stores numbers as strings. We parse
once at ingest with from_json against CDX_JSON_SCHEMA (string-typed, matching
the wire format) and cast in the projection. `offset` is bigint here where
the reference uses Integer (CCIndexRecord.java:53) — documented divergence:
int would overflow >2 GiB compound WARCs.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire-format JSON schema: every value is a string in the CC index JSON.
# Keys are the CC kebab-case names (CCIndexRecord.java:38 kebab binding).
CDX_JSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("mime-detected", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("languages", T.StringType()),
        T.StructField("truncated", T.StringType()),
        T.StructField("redirect", T.StringType()),
    ]
)

# Engine-internal parsed record table (SURVEY.md §1.3). Adds provenance
# columns the reference discards: surt_key, ts (CCIndexRecord.java:105-112
# drops both), index_file/index_file_seq/line_no (lineage + canonical order).
CDX_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("surt_key", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("mime_detected", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("languages", T.StringType()),
        T.StructField("truncated", T.StringType()),
        T.StructField("redirect", T.StringType()),
        T.StructField("index_file", T.StringType()),
        T.StructField("index_file_seq", T.IntegerType()),
        T.StructField("line_no", T.LongType()),
    ]
)

# Interleaved document table — EXACTLY BASELINE.json input_hint:
# (doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA)),
    ]
)

# Frontier tables (net-new, FIXTURES.md §5-7)
SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("discovered_ts", T.TimestampType()),
        T.StructField("recrawl_score", T.DoubleType()),
    ]
)
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        # RFC 9309 Allow prefixes (longest-match beats Disallow, ties to
        # Allow); frames without this column still work — apply_robots
        # treats it as empty (prefix-blocking only)
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
    ]
)
HOST_BUDGET_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("tokens_per_sec", T.DoubleType()),
        T.StructField("burst", T.IntegerType()),
        T.StructField("max_per_batch", T.IntegerType()),
    ]
)
URLSEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
    ]
)

# Extraction output tables (reference CSV log sinks, log4j2.xml:24-26,33-46)
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("mime_detected", T.StringType()),
        T.StructField("warc_file", T.StringType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_length", T.LongType()),
        T.StructField("truncated", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("digest_ok", T.BooleanType()),
    ]
)
TRUNCATED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("mime_detected", T.StringType()),
        T.StructField("warc_file", T.StringType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_length", T.LongType()),
        T.StructField("truncated", T.StringType()),
    ]
)
