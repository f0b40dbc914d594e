"""Deterministic Bernoulli sampling gate.

The reference samples with an UNSEEDED java.util.Random per clause
(selector/AbstractSamplingSelector.java:40-55) — nondeterministic, so it
cannot reproduce its own runs. The engine's contract replaces it with a
seeded hash gate that is (a) deterministic across runs/cluster sizes,
(b) independent per clause, (c) uniform:

    (abs(xxhash64(value, clause_id, seed)) % 2^32) / 2^32 <= sample

Both the Spark plan and the pure-Python oracle implement this identical
rule (FIXTURES.md 'Sampling determinism').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MOD = 2**32


def sample_gate(
    value_col: Column | str, sample: float, clause_id: str, seed: int = 42
) -> Column:
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    # seed cast to long so the hash lane width is unambiguous (the oracle's
    # pure-python port hashes it as an 8-byte lane)
    h = F.abs(F.xxhash64(c, F.lit(clause_id), F.lit(seed).cast("long")))
    return (h % F.lit(_MOD)) / F.lit(float(_MOD)) <= F.lit(float(sample))


def sample_gate_py(value: str, sample: float, clause_id: str, seed: int = 42) -> bool:
    """Python twin — matches sample_gate bit-for-bit via the package's
    pure-Python xxhash64 port (functions/xxhash.py); the pytest oracle
    imports the same port, so JVM-vs-Python parity stays independently
    checked."""
    from commoncrawl_fetcher_lite_spark.functions.xxhash import xxhash64_spark

    # three lanes (value, clause_id, seed-as-long) with Spark's default
    # initial seed — the exact chaining F.xxhash64(c, clause_id, seed) does
    h = abs(xxhash64_spark([value, clause_id, seed]))
    return (h % _MOD) / float(_MOD) <= sample
