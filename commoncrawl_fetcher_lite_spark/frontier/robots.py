"""robots.txt parsing → the (host, disallow_prefixes, crawl_delay_s) frame
that politeness.apply_robots / host_quota consume.

No reference analog (the reference fetches from the CC mirror and never
consults robots); the north rule names robots rules first-class. Semantics
follow the public Robots Exclusion Protocol (RFC 9309):

  * groups of `User-agent:` lines followed by rules; the group applied is
    the one whose user-agent token is the LONGEST case-insensitive
    substring match for our agent, falling back to `*`.
  * `Disallow:` / `Allow:` values collect as path prefixes; an empty value
    means allow-everything (contributes no prefix).
  * precedence is RFC 9309 longest-match: the matching rule with the most
    octets wins, ties go to Allow — so `Allow: /public` under
    `Disallow: /` admits /public/* while blocking the rest
    (politeness.apply_robots implements the comparison as two HOF
    max-match-length aggregates). `*`/`$` wildcards are not modeled
    (prefix semantics only — the common-case subset).
  * `Crawl-delay:` parses as seconds (non-standard but ubiquitous; fed to
    host_quota's token-rate cap, politeness.py:69-76).

Parsing is a mapInPandas over one row PER HOST — deliberately plain Python:
the robots table is ~10^7 rows when the frontier is 10^10 URLs, three
orders of magnitude off the hot path, and parse cost is one linear scan of
a small text blob.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def parse_robots_txt(
    body: str, agent: str = "*"
) -> tuple[list[str], list[str], float | None]:
    """→ (disallow_prefixes, allow_prefixes, crawl_delay_s) for the
    best-matching UA group."""
    agent_lc = (agent or "*").lower()
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    cur_allows: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_allows, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_allows, cur_delay))
        cur_agents, cur_rules, cur_allows, cur_delay = [], [], [], None
        in_rules = False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(value.lower())
        elif field in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            if field == "disallow" and value:
                cur_rules.append(value)
            elif field == "allow" and value:
                cur_allows.append(value)
            elif field == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
    flush()

    best: tuple[int, list[str], list[str], float | None] | None = None
    for agents, rules, allows, delay in groups:
        for ua in agents:
            if ua == "*":
                score = 0
            elif ua and ua in agent_lc:
                score = len(ua)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules, allows, delay)
    if best is None:
        return [], [], None
    return best[1], best[2], best[3]


ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
    ]
)


def robots_frame(
    bodies: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, crawl_delay_s)."""
    sel = bodies.selectExpr(f"{host_col} as host", f"{body_col} as body")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                prefixes, allows, delay = parse_robots_txt(body, agent)
                rows.append(
                    {
                        "host": host,
                        "disallow_prefixes": prefixes,
                        "allow_prefixes": allows,
                        "crawl_delay_s": delay,
                    }
                )
            yield pd.DataFrame(rows)

    return sel.mapInPandas(run, schema=ROBOTS_SCHEMA)
