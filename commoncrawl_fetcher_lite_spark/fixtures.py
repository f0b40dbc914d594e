"""Deterministic synthetic fixtures (FIXTURES.md).

Everything is a pure function of (seed, row_index) — regeneration is
byte-stable. No external data, no network. Shapes mirror the reference's
inputs: CDX lines (`{surt} {ts14} {json}` — CCIndexRecord.java:105-112),
compound WARC files (concatenated gzip members — README.md:21-31), plus the
engine's frontier tables (seeds/robots/host_budget).

The WARC payloads for text documents embed `[[MEDIA:i]]` markers between
paragraphs; the engine's document assembler turns those into interleaved
text/media span sequences (the input_hint docs shape). Media-mime records
become single-media-span docs.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import json
import os
import random
from dataclasses import dataclass, field

MIME_DIST = [
    ("text/html", 0.70),
    ("application/pdf", 0.10),
    ("image/jpeg", 0.08),
    ("video/mp4", 0.05),
    ("application/octet-stream", 0.04),
    ("text/plain", 0.03),
]
STATUS_DIST = [(200, 0.80), (302, 0.08), (404, 0.07), (500, 0.05)]
TEXT_MIMES = {"text/html", "text/plain"}
N_HOSTS = 200
WORDS = (
    "crawl index fetch record warc payload span media text host url page "
    "data web link anchor title body image video frame token stream batch"
).split()


def _pick(rng: random.Random, dist: list[tuple]) -> object:
    x = rng.random()
    acc = 0.0
    for v, p in dist:
        acc += p
        if x <= acc:
            return v
    return dist[-1][0]


def _zipf_host(rng: random.Random) -> str:
    # rank-1 host gets ~20% of urls: weights 1/rank normalized
    weights = [1.0 / (r + 1) for r in range(N_HOSTS)]
    total = sum(weights)
    x = rng.random() * total
    acc = 0.0
    for r, w in enumerate(weights):
        acc += w
        if x <= acc:
            return f"host{r:03d}.example.com"
    return f"host{N_HOSTS - 1:03d}.example.com"


def _surt(host: str, path: str) -> str:
    parts = host.split(".")
    return ",".join(reversed(parts)) + ")" + path


def sha1_b32(b: bytes) -> str:
    return base64.b32encode(hashlib.sha1(b).digest()).decode("ascii")


def _payload_for(rng: random.Random, i: int, mime: str) -> bytes:
    if mime in TEXT_MIMES:
        n_spans = 1 + rng.randrange(8)
        parts = []
        media_idx = 0
        for s in range(n_spans):
            if s % 2 == 1:
                parts.append(f"[[MEDIA:{media_idx}]]")
                media_idx += 1
            else:
                n_words = 5 + rng.randrange(20)
                parts.append(" ".join(rng.choice(WORDS) for _ in range(n_words)))
        return ("\n\n".join(parts)).encode("utf-8")
    # media payload: deterministic pseudo-random bytes ≤ 64 KiB
    size = 256 + rng.randrange(65536 - 256)
    return random.Random(f"{i}:media").randbytes(size)


def make_warc_member(url: str, mime: str, payload: bytes) -> bytes:
    """One gzip member holding one WARC/1.0 response record (CC layout)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {mime}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
        + payload
    )
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + b"\r\n"
        + http
        + b"\r\n\r\n"
    )
    buf = io.BytesIO()
    # fixed mtime for byte-stable gzip output
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(warc)
    return buf.getvalue()


@dataclass
class Fixture:
    root: str
    index_paths: list[str] = field(default_factory=list)
    paths_gz: str = ""
    warc_dir: str = ""
    n_lines: int = 0
    # truth rows: one dict per generated NON-dirty record with its payload
    records: list[dict] = field(default_factory=list)
    # all raw lines per file (incl. dirty), for oracle replay
    lines_per_file: dict[str, list[str]] = field(default_factory=dict)


def generate(
    root: str,
    seed: int = 42,
    n_lines: int = 1000,
    n_index_files: int = 4,
    n_warc_files: int = 10,
) -> Fixture:
    """Materialize the full fixture tree under `root`.

    Layout: root/indexes/cdx-0000N.gz, root/cc-index.paths.gz,
    root/warcs/CC-TEST-...-0000K.warc.gz, root/{seeds,robots,host_budget}.parquet
    """
    os.makedirs(os.path.join(root, "indexes"), exist_ok=True)
    warc_dir = os.path.join(root, "warcs")
    os.makedirs(warc_dir, exist_ok=True)

    fx = Fixture(root=root, warc_dir=warc_dir, n_lines=n_lines)
    warc_bufs: list[bytearray] = [bytearray() for _ in range(n_warc_files)]
    warc_names = [
        f"crawl-data/CC-TEST-2023-01/segments/seg{k % 3}/warc/"
        f"CC-TEST-20230101-{k:05d}.warc.gz"
        for k in range(n_warc_files)
    ]

    lines_per_file: dict[int, list[str]] = {k: [] for k in range(n_index_files)}

    for i in range(n_lines):
        rng = random.Random(f"{seed}:{i}")
        file_idx = i % n_index_files
        dirty_roll = rng.random()

        host = _zipf_host(rng)
        path = f"/p/{i}.html"
        url = f"https://{host}{path}"
        mime_det = _pick(rng, MIME_DIST)
        status = _pick(rng, STATUS_DIST)
        ts = f"2023{1 + rng.randrange(12):02d}{1 + rng.randrange(28):02d}120000"

        # mime = mime_detected with 10% formatting noise (normalizeMime food)
        mime = mime_det
        noise = rng.random()
        if noise < 0.033:
            mime = f'"{mime_det}"'
        elif noise < 0.066:
            mime = mime_det.upper()
        elif noise < 0.10:
            mime = f"  {mime_det}\t "

        truncated = "length" if rng.random() < 0.10 else None
        redirect = f"https://{host}/redirected" if status == 302 else None

        payload = _payload_for(rng, i, mime_det)
        # ~5% empty payload, ~2% digest mismatch
        if rng.random() < 0.05:
            payload = b""
        digest = sha1_b32(payload)
        if rng.random() < 0.02:
            digest = ("X" + digest[1:]) if digest[0] != "X" else ("Y" + digest[1:])

        warc_idx = i % n_warc_files
        member = make_warc_member(url, mime_det, payload)
        offset = len(warc_bufs[warc_idx])
        warc_bufs[warc_idx].extend(member)
        length = len(member)
        filename = warc_names[warc_idx]

        rec = {
            "url": url,
            "mime": mime,
            "mime-detected": mime_det,
            "status": str(status),
            "digest": digest,
            "length": str(length),
            "offset": str(offset),
            "filename": filename,
            "charset": "UTF-8",
            "languages": "eng",
        }
        if truncated:
            rec["truncated"] = truncated
        if redirect:
            rec["redirect"] = redirect

        surt = _surt(host, path)
        line = f"{surt} {ts} {json.dumps(rec, separators=(',', ': '))}"

        # dirty rows ~2% of the stream (FIXTURES.md §1), deterministic roll
        if dirty_roll < 0.004:
            line = f"{surt}{ts}{json.dumps(rec)}"  # no spaces → split drop
        elif dirty_roll < 0.008:
            line = line + " trailing-garbage-after-json"  # repairable
        elif dirty_roll < 0.012:
            line = f"{surt} {ts} {{not valid json at all"  # unparseable drop
        elif dirty_roll < 0.016:
            rec2 = {k: v for k, v in rec.items() if k != "mime-detected"}
            line = f"{surt} {ts} {json.dumps(rec2, separators=(',', ': '))}"
            rec = rec2  # null mime_detected (null-field selector semantics)
        elif dirty_roll < 0.020:
            lines_per_file[file_idx].append("   ")  # blank line, then normal line

        lines_per_file[file_idx].append(line)
        fx.records.append(
            {
                "i": i,
                "file_idx": file_idx,
                "line": line,
                "payload": payload,
                "dirty": dirty_roll < 0.012,
            }
        )

    # write index gz files
    for k in range(n_index_files):
        p = os.path.join(root, "indexes", f"cdx-{k:05d}.gz")
        with gzip.GzipFile(p, "wb", mtime=0) as gz:
            gz.write(("\n".join(lines_per_file[k]) + "\n").encode("utf-8"))
        fx.index_paths.append(p)
        fx.lines_per_file[p] = lines_per_file[k]

    # path list with a comment and a non-.gz line to skip
    paths_gz = os.path.join(root, "cc-index.paths.gz")
    listing = (
        "#comment line\n"
        + "\n".join(os.path.join("indexes", f"cdx-{k:05d}.gz") for k in range(n_index_files))
        + "\nindexes/cluster.idx\n"
    )
    with gzip.GzipFile(paths_gz, "wb", mtime=0) as gz:
        gz.write(listing.encode("utf-8"))
    fx.paths_gz = paths_gz

    # write compound warc files
    for k, name in enumerate(warc_names):
        local = os.path.join(warc_dir, os.path.basename(name))
        with open(local, "wb") as f:
            f.write(bytes(warc_bufs[k]))

    _write_frontier_tables(root, seed)
    return fx


def warc_local_path(fixture_root: str, cc_filename: str) -> str:
    return os.path.join(fixture_root, "warcs", os.path.basename(cc_filename))


def _write_frontier_tables(root: str, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(f"{seed}:frontier")
    # seeds: ~10k urls over the host distribution, ~15% duplicate urls
    n = 10_000
    urls, hosts, prio, ts, score = [], [], [], [], []
    pool: list[tuple[str, str]] = []
    for i in range(n):
        r = random.Random(f"{seed}:seed:{i}")
        if pool and r.random() < 0.15:
            u, h = pool[r.randrange(len(pool))]
        else:
            h = _zipf_host(r)
            u = f"https://{h}/s/{i}"
            pool.append((u, h))
        urls.append(u)
        hosts.append(h)
        prio.append(round(r.random(), 6))
        ts.append(1672531200_000_000 + i * 1_000_000)  # microseconds
        score.append(round(r.random(), 6))
    pq.write_table(
        pa.table(
            {
                "url": urls,
                "host": hosts,
                "priority": prio,
                "discovered_ts": pa.array(ts, pa.timestamp("us")),
                "recrawl_score": score,
            }
        ),
        os.path.join(root, "seeds.parquet"),
    )

    hosts_all = [f"host{r:03d}.example.com" for r in range(N_HOSTS)]
    dis, delay = [], []
    for r, h in enumerate(hosts_all):
        hr = random.Random(f"{seed}:robots:{r}")
        dis.append(["/private/", f"/s/{r}"] if hr.random() < 0.10 else [])
        delay.append(round(0.5 + hr.random() * 4, 2) if hr.random() < 0.20 else None)
    pq.write_table(
        pa.table({"host": hosts_all, "disallow_prefixes": dis, "crawl_delay_s": delay}),
        os.path.join(root, "robots.parquet"),
    )

    hb_hosts = ["*"] + hosts_all[:5]
    pq.write_table(
        pa.table(
            {
                "host": hb_hosts,
                "tokens_per_sec": [1.0, 4.0, 4.0, 2.0, 2.0, 2.0],
                "burst": [10, 40, 40, 20, 20, 20],
                "max_per_batch": [100, 400, 400, 200, 200, 200],
            }
        ),
        os.path.join(root, "host_budget.parquet"),
    )
