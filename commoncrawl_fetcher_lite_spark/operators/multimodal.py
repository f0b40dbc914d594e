"""Multimodal column operators: opaque binary media + typed metadata.

Media spans (the `media_ref`/binary payloads the extraction pipeline emits)
are treated as opaque `binary` columns with typed metadata. The Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested; the actual codec work (image decode, audio resample,
frame sampling) is STUBBED behind `decode_stub=True` (deterministic fake)
or raises NotImplementedError, because no image/audio libraries exist in
this container. On a real cluster you drop Pillow/torchaudio calls into the
marked spots without touching the plumbing.

Scale design: media bytes stay in executor-side Arrow batches end to end
(mapInPandas), repartitioned by media size bucket so one giant video can't
skew a task; metadata extraction is a separate cheap column pass.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("kind", T.StringType()),  # image|audio|video|other
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "image",
    b"\x89PNG": "image",
    b"ID3": "audio",
    b"\x00\x00\x00": "video",  # mp4-ish ftyp boxes start with size
}


def classify_media(df: DataFrame, bytes_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Cheap metadata pass: size, sha256, magic-byte kind. Pure Catalyst
    except the magic lookup (a substring CASE — still JVM-side)."""
    b = F.col(bytes_col)
    head = F.substring(b, 1, 4)
    kind = (
        F.when(F.substring(b, 1, 3) == bytes(b"\xff\xd8\xff"), "image")
        .when(head == bytes(b"\x89PNG"), "image")
        .when(F.substring(b, 1, 3) == bytes(b"ID3"), "audio")
        .otherwise("other")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(b).cast("long").alias("n_bytes"),
        F.lower(F.sha2(b, 256)).alias("sha256"),
        kind.alias("kind"),
    )


def repartition_by_size(df: DataFrame, bytes_col: str = "payload", n_buckets: int = 8) -> DataFrame:
    """Skew guard: co-partition by size bucket so huge payloads spread."""
    bucket = F.least(
        F.lit(n_buckets - 1), (F.log2(F.length(bytes_col) + 1)).cast("int")
    )
    return df.repartition(bucket)


def extract_features(
    df: DataFrame,
    bytes_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "kind",
    decode_stub: bool = True,
    feature_dim: int = 16,
) -> DataFrame:
    """Decode / feature-extract via mapInPandas over Arrow batches.

    decode_stub=True → deterministic fake features (sha256-seeded floats)
    with fake dimensions, exercising the full batch path. decode_stub=False
    → NotImplementedError at the decode spot (no codec libs here)."""
    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(kind_col).alias("kind"),
        F.col(bytes_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if not decode_stub:
                    raise NotImplementedError(
                        "real decode needs Pillow/av/torchaudio — not in container"
                    )
                # -- deterministic fake decode (replace with real codecs) --
                h = hashlib.sha256(bytes(payload or b"")).digest()
                feat = [
                    round((h[i % 32] / 255.0) * 2 - 1, 6) for i in range(feature_dim)
                ]
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": 16 + h[0] % 64 if kind == "image" else None,
                        "height": 16 + h[1] % 64 if kind == "image" else None,
                        "n_frames": 1 + h[2] % 30 if kind == "video" else None,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return sel.mapInPandas(run, schema=FEATURE_SCHEMA)
