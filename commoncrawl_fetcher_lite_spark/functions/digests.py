"""Digest helpers.

Reference computes Base32(SHA-1(payload)) to verify against the CDX index
digest and SHA-256-hex for the content-addressed target name
(extractor/FileFromCCWarcExtractor.java:123-140).

sha256_hex is pure Catalyst (F.sha2). Spark has no base32 codec, so
sha1_base32 is an Arrow-batched pandas UDF over binary — vectorized, and it
only runs on the (small) extracted-payload stream, never the index scan.
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def sha256_hex(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.sha2(c, 256))


@pandas_udf(T.StringType())
def _sha1_base32_udf(payload: pd.Series) -> pd.Series:
    def one(b: bytes | None) -> str | None:
        if b is None:
            return None
        return base64.b32encode(hashlib.sha1(b).digest()).decode("ascii")

    return payload.map(one)


def sha1_base32(col: Column | str) -> Column:
    """Base32(SHA-1(bytes)) — the CC index 'digest' encoding."""
    c = F.col(col) if isinstance(col, str) else col
    return _sha1_base32_udf(c)

