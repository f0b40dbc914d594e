"""Budget / limit operators: maxRecords, maxFilesExtracted, maxFilesTruncated.

Reference semantics (extractor/CCFileExtractorRecordProcessor.java:58-112,
numThreads=1 canonical order — SURVEY §2.4):

  * every non-blank line increments recordsRead BEFORE parse; when the
    counter reaches maxRecords the run STOPS and that line is NOT processed
    (:60-67) — i.e. exactly (maxRecords - 1) lines are fully processed.
  * every SELECTED truncated record increments `truncated` (even when
    extractTruncated=true); reaching maxFilesTruncated stops the run and
    drops that record (:81-88).
  * every selected extractable record (extractTruncated or not-truncated)
    increments `filesExtracted`; reaching maxFilesExtracted stops the run
    and drops that record (:91-96).
  * the run stops at the FIRST trip of any counter in canonical order
    (index_file_seq, line_no) ascending.

Scale design — no global sort, no giant window:
  * cum_read needs no window at all: blanks were dropped at scan, so the
    running read-count of a row is ``file_offset(seq) + line_no + 1`` where
    file_offset is the cumulative line count of earlier files — a per-file
    aggregate (≤ hundreds of rows) cumsum'd on the driver and broadcast.
  * cum_trunc / cum_extr are windows over the SELECTED subset only (a small
    fraction of the scan), two-level: per-file partial counts → driver
    cumsum → per-file window row_number, so the only shuffle is over
    selected rows partitioned by file (matches scan granularity).
  * stop position = min canonical position where any trip fires — one tiny
    aggregate — then one broadcast-compared filter. Deterministic at any
    parallelism, unlike the reference's racy multi-thread counters.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.config import LONG_MAX

# canonical position packs (file_seq, line_no) into one sortable long;
# line_no < 2^40 per file is safe (a gz index file holds ~3M lines).
_POS_SHIFT = 40


def canonical_pos(seq: Column, line_no: Column) -> Column:
    return (seq.cast("long") * F.lit(1 << _POS_SHIFT)) + line_no


@dataclass(frozen=True)
class BudgetResult:
    """Rows surviving each branch after budget cutoff."""

    extracted: DataFrame  # selected, extractable, before stop
    truncated_logged: DataFrame  # selected, truncated, NOT extracted branch
    stop_pos: int | None  # canonical position where the run stopped


def apply_budgets(
    records: DataFrame,
    selected: Column,
    max_records: int = LONG_MAX,
    max_files_extracted: int = LONG_MAX,
    max_files_truncated: int = LONG_MAX,
    extract_truncated: bool = False,
    per_file_lines: dict[int, int] | None = None,
) -> DataFrame:
    """Annotate `records` (the parsed CDX table, which must still carry
    index_file_seq + line_no over the full non-blank line stream) with
    branch flags and drop everything at/after the first budget trip.

    Returns the surviving rows with boolean columns `is_selected`,
    `is_truncated_rec`, `is_extract_branch`, `is_trunc_log_branch`.

    NOTE on cum_read: parse failures are dropped from `records` by parse_cdx
    but still counted by the reference. line_no indexes the full non-blank
    stream (assigned pre-parse), so per-row cum_read stays exact; per-file
    totals are approximated by max(line_no)+1 unless the caller passes
    ``per_file_lines`` (seq -> true non-blank line count from the scan
    stage), which is exact even when a file's trailing lines were dropped.
    """
    is_trunc = F.coalesce(F.col("truncated"), F.lit("")) != ""  # isBlank analog
    df = records.withColumn("is_selected", selected)
    df = df.withColumn("is_truncated_rec", is_trunc)
    df = df.withColumn(
        "is_extract_branch",
        F.col("is_selected") & (F.lit(extract_truncated) | ~is_trunc),
    )
    df = df.withColumn(
        "is_trunc_log_branch",
        F.col("is_selected") & is_trunc & F.lit(not extract_truncated),
    )
    df = df.withColumn("pos", canonical_pos(F.col("index_file_seq"), F.col("line_no")))

    no_budget = (
        max_records >= LONG_MAX
        and max_files_extracted >= LONG_MAX
        and max_files_truncated >= LONG_MAX
    )
    if no_budget:
        return df

    # --- per-file partials (tiny result: one row per index file) ---
    per_file = (
        df.groupBy("index_file_seq")
        .agg(
            (F.max("line_no") + 1).alias("n_lines"),
            F.sum(F.when(F.col("is_selected") & is_trunc, 1).otherwise(0)).alias(
                "n_trunc"
            ),
            F.sum(F.when(F.col("is_extract_branch"), 1).otherwise(0)).alias("n_extr"),
        )
        .collect()
    )
    per_file.sort(key=lambda r: r["index_file_seq"])
    read_off: dict[int, int] = {}
    trunc_off: dict[int, int] = {}
    extr_off: dict[int, int] = {}
    cr = ct = ce = 0
    for r in per_file:
        seq = r["index_file_seq"]
        read_off[seq] = cr
        trunc_off[seq] = ct
        extr_off[seq] = ce
        n_lines = r["n_lines"]
        if per_file_lines is not None and seq in per_file_lines:
            n_lines = per_file_lines[seq]
        cr += n_lines
        ct += r["n_trunc"]
        ce += r["n_extr"]

    spark = records.sparkSession

    # read-trip: cum_read = read_off(seq) + line_no + 1 is pure arithmetic,
    # so the FIRST line where it reaches max_records is computed driver-side
    # from the per-file offsets — no distributed work at all.
    stop_candidates: list[int] = []
    if max_records <= 0:
        stop_candidates.append(0)
    elif max_records < LONG_MAX:
        seqs = sorted(read_off)
        for idx, s in enumerate(seqs):
            nxt = read_off[seqs[idx + 1]] if idx + 1 < len(seqs) else cr
            if read_off[s] < max_records <= nxt:
                trip_line = max_records - read_off[s] - 1
                stop_candidates.append((s << _POS_SHIFT) + trip_line)
                break
        if not stop_candidates and cr >= max_records:
            # boundary: trip lands exactly past the last counted line
            stop_candidates.append(((seqs[-1] + 1) << _POS_SHIFT))

    # trunc/extr trips need running counts — but only over the SELECTED
    # subset (a small fraction of the scan): the full stream is never
    # shuffled, only selected rows move in the per-file window.
    need_window = max_files_truncated < LONG_MAX or max_files_extracted < LONG_MAX
    if need_window:
        off_df = F.broadcast(
            spark.createDataFrame(
                [(s, trunc_off[s], extr_off[s]) for s in trunc_off],
                "index_file_seq int, trunc_off long, extr_off long",
            )
        )
        sel = df.where(F.col("is_selected")).join(off_df, "index_file_seq")
        w = Window.partitionBy("index_file_seq").orderBy("line_no")
        sel = sel.withColumn(
            "cum_trunc",
            F.col("trunc_off")
            + F.sum(F.when(is_trunc, 1).otherwise(0)).over(w),
        ).withColumn(
            "cum_extr",
            F.col("extr_off")
            + F.sum(F.when(F.col("is_extract_branch"), 1).otherwise(0)).over(w),
        )
        trip = F.lit(False)
        if max_files_truncated < LONG_MAX:
            trip = trip | (is_trunc & (F.col("cum_trunc") >= max_files_truncated))
        if max_files_extracted < LONG_MAX:
            trip = trip | (
                F.col("is_extract_branch") & (F.col("cum_extr") >= max_files_extracted)
            )
        stop_row = sel.where(trip).agg(F.min("pos").alias("stop")).collect()[0]
        if stop_row["stop"] is not None:
            stop_candidates.append(stop_row["stop"])

    if stop_candidates:
        df = df.where(F.col("pos") < F.lit(min(stop_candidates)))
    return df
