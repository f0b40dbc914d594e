"""Pure-Python XXH64 (public algorithm, xxhash.com spec) matching Spark's
XxHash64 expression: strings hash their UTF-8 bytes; longs hash as a single
8-byte lane; multi-arg chains seed each arg with the prior hash.

Lives in the package (not the test tree) because production helpers like
functions.sampling.sample_gate_py need the same bit-exact port; the pytest
oracle imports from here, so the JVM-vs-Python parity checks are unchanged.
"""

from __future__ import annotations


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    seed &= _M
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        i = 0
        while i <= n - 32:
            for vi, off in ((1, 0), (2, 8), (3, 16), (4, 24)):
                k = int.from_bytes(data[i + off : i + off + 8], "little")
                v = (v1, v2, v3, v4)[vi - 1]
                v = (v + k * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if vi == 1:
                    v1 = v
                elif vi == 2:
                    v2 = v
                elif vi == 3:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k = (v * _P2) & _M
            k = (_rotl(k, 31) * _P1) & _M
            h ^= k
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * _P2) & _M
        k = (_rotl(k, 31) * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _avalanche(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: one 8-byte lane."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    k = (value & _M) * _P2 & _M
    k = (_rotl(k, 31) * _P1) & _M
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _avalanche(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_spark(args: list, seed: int = 42) -> int:
    """Spark F.xxhash64(*args) — chain: each arg hashed with the running
    hash as seed; strings as UTF-8 bytes, ints as longs. Returns SIGNED
    64-bit like Spark's LongType."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, int):
            h = xxh64_long(a, h)
        else:
            raise TypeError(type(a))
    return _to_signed(h)


