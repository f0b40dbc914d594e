"""S11 — CSV log export matching the reference's four log streams.

Reference appenders (log4j2.xml:24-26, 33-46) and write sites
(FileFromCCWarcExtractor.logSuccess :165-188,
CCFileExtractorRecordProcessor.java:104-110):

  extracted-urls.csv      url,mime,mime_detected,warc_file,warc_offset,
                          warc_length,sha256,length,path
  extracted-urls-all.csv  same + truncated (used when extractTruncated)
  urls-truncated.csv      url (no header in the reference)
  urls-truncated-full.csv url,mime,mime_detected,warc_file,warc_offset,
                          warc_length,truncated

Mimes are the NORMALIZED forms (getNormalizedMime[Detected]). The engine's
primary outputs are the `extracted`/`truncated` tables; these CSVs exist
for byte-level parity checks and drop-in replacement of the reference's
log-scraping consumers.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.functions.urls import normalize_mime
from commoncrawl_fetcher_lite_spark.plans.fetch_pipeline import FetchResult

EXTRACTED_COLS = [
    "url", "mime", "mime_detected", "warc_file", "warc_offset",
    "warc_length", "sha256", "length", "path",
]
TRUNCATED_FULL_COLS = [
    "url", "mime", "mime_detected", "warc_file", "warc_offset",
    "warc_length", "truncated",
]


def export_csv_logs(
    res: FetchResult, out_dir: str, extract_truncated: bool = False
) -> None:
    os.makedirs(out_dir, exist_ok=True)

    if res.extracted is not None:
        ext = res.extracted.withColumn(
            "mime", normalize_mime(F.col("mime"))
        ).withColumn("mime_detected", normalize_mime(F.col("mime_detected")))
        if extract_truncated:
            cols = EXTRACTED_COLS[:6] + ["truncated"] + EXTRACTED_COLS[6:]
            name = "extracted-urls-all"
        else:
            cols, name = EXTRACTED_COLS, "extracted-urls"
        (
            ext.select(*cols)
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .csv(os.path.join(out_dir, name))
        )

    (
        res.truncated_logged.select("url")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", False)  # reference's urls-truncated.csv has none
        .csv(os.path.join(out_dir, "urls-truncated"))
    )
    (
        res.truncated_logged.select(*TRUNCATED_FULL_COLS)
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(os.path.join(out_dir, "urls-truncated-full"))
    )
