"""Streaming exact-dedup ledger (streaming/dedup_stream.py): stateful
digest counts must accumulate ACROSS micro-batches and end equal to the
batch GROUP BY answer."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.streaming.dedup_stream import (
    run_to_memory,
    stream_documents,
    streaming_digest_counts,
)

SCHEMA = "doc_id long, text string"


def _write(spark, path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [i for i, _ in rows],
                "text": [t for _, t in rows],
            }
        ),
        path,
    )


def test_digest_counts_accumulate_across_batches(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    # 'dup' appears in all three files, 'twice' in two, rest unique —
    # distinct mtimes make one micro-batch per file
    _write(spark, f"{docs_dir}/a.parquet", [(0, "dup"), (1, "twice"), (2, "only a")])
    time.sleep(1.1)
    _write(spark, f"{docs_dir}/b.parquet", [(3, "dup"), (4, "twice")])
    time.sleep(1.1)
    _write(spark, f"{docs_dir}/c.parquet", [(5, "dup"), (6, "only c")])

    stream = stream_documents(
        spark, docs_dir, spark.read.parquet(docs_dir).schema, max_files_per_trigger=1
    )
    run_to_memory(streaming_digest_counts(stream), "t_stream_dedup")
    got = {
        r["digest"]: r["n_docs"]
        for r in spark.table("t_stream_dedup").collect()
    }

    want = {
        r["digest"]: r["n_docs"]
        for r in spark.read.parquet(docs_dir)
        .select(F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    }
    assert got == want
    assert sorted(got.values(), reverse=True)[:2] == [3, 2]
