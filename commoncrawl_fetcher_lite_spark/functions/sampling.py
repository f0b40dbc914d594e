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
    """Oracle twin — must match sample_gate bit-for-bit. Uses the same
    xxhash64 via Spark is impossible driver-side, so we reimplement Spark's
    multi-arg xxhash64 chaining in tests via a tiny Spark job instead; this
    helper exists for API symmetry and delegates to the xxhash64 port in
    tests/oracle.py."""
    from tests.oracle import xxhash64_spark  # lazy; tests only

    h = abs(xxhash64_spark([value, clause_id], seed))
    return (h % _MOD) / float(_MOD) <= sample
