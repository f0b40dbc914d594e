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

def classify_media(df: DataFrame, bytes_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Cheap metadata pass: size, sha256, magic-byte kind. Pure Catalyst
    except the magic lookup (a substring CASE — still JVM-side).

    Video: ISO-BMFF (mp4/mov) starts with a 4-byte box size then 'ftyp' at
    offset 4; Matroska/WebM starts with the EBML magic 1A 45 DF A3."""
    b = F.col(bytes_col)
    head = F.substring(b, 1, 4)
    kind = (
        F.when(F.substring(b, 1, 3) == bytes(b"\xff\xd8\xff"), "image")
        .when(head == bytes(b"\x89PNG"), "image")
        .when(F.substring(b, 1, 3) == bytes(b"ID3"), "audio")
        .when(F.substring(b, 5, 4) == bytes(b"ftyp"), "video")
        .when(head == bytes(b"\x1a\x45\xdf\xa3"), "video")
        .otherwise("other")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(b).cast("long").alias("n_bytes"),
        F.lower(F.sha2(b, 256)).alias("sha256"),
        kind.alias("kind"),
    )


def repartition_by_size(
    df: DataFrame,
    bytes_col: str = "payload",
    n_buckets: int = 8,
    n_salt: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew guard: SPREAD huge payloads across tasks.

    Partitioning by the size bucket alone would do the opposite — hash-route
    every largest payload to the same task. Salting on a cheap content hash
    (first 64 bytes + length, deterministic) spreads equal-size payloads
    over n_salt tasks while keeping wildly different sizes from sharing a
    task's memory budget. The partition count is EXPLICIT (defaults to the
    session's shuffle partitions): an unnumbered repartition lets AQE
    byte-coalesce, which is row-size-blind and would re-concentrate the
    few-but-huge payload partitions this guard exists to spread."""
    bucket = F.least(
        F.lit(n_buckets - 1), (F.log2(F.length(bytes_col) + 1)).cast("int")
    )
    salt = F.pmod(
        F.xxhash64(F.substring(F.col(bytes_col), 1, 64), F.length(bytes_col)),
        F.lit(n_salt),
    )
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    return df.repartition(num_partitions, bucket, salt)


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
    → import-gated real decode (same pattern as fetcher.make_s3_client):
    Pillow for images when installed, else NotImplementedError at the
    decode spot — clusters with codec libs get real features without
    touching the plumbing."""
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
                    rows.append(
                        _decode_real(mid, kind, bytes(payload or b""), feature_dim)
                    )
                    continue
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


def _load_pillow():
    """Import-gated Pillow (separate function so tests can monkeypatch)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_real(mid: str, kind: str, payload: bytes, feature_dim: int) -> dict:
    """Real decode for the kinds we have a library for; NotImplementedError
    otherwise. Image path: Pillow open → (width, height) + a grayscale
    thumbnail flattened to `feature_dim` floats in [-1, 1] — the standard
    cheap visual fingerprint; swap in a real embedding model on clusters
    that carry one."""
    if kind == "image":
        Image = _load_pillow()
        if Image is None:
            raise NotImplementedError(
                "real image decode needs Pillow — not installed on this node"
            )
        import io
        import math

        img = Image.open(io.BytesIO(payload))
        width, height = img.size
        side = max(1, int(math.isqrt(feature_dim)))
        thumb = img.convert("L").resize((side, side))
        px = list(thumb.getdata())
        feat = [round(p / 255.0 * 2 - 1, 6) for p in px]
        feat = (feat + [0.0] * feature_dim)[:feature_dim]
        return {
            "media_id": mid,
            "kind": kind,
            "width": width,
            "height": height,
            "n_frames": None,
            "feature": feat,
        }
    raise NotImplementedError(
        f"real decode for kind={kind!r} needs av/torchaudio — not installed"
    )
