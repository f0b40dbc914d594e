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
    PATTERN octets wins, ties go to Allow — so `Allow: /public` under
    `Disallow: /` admits /public/* while blocking the rest.
  * `*` (any char sequence) and trailing `$` (end anchor) wildcards are
    fully modeled: robots_frame pre-translates each wildcard rule to an
    anchored regex ONCE per host (off the hot path) and emits two
    precompiled rule arrays — `plain_rules` (prefix match, the common
    case) and `wild_rules` (regex match) — that
    politeness.apply_robots folds in a SINGLE fused aggregate per
    candidate (one traversal, not one per direction; a mid-pattern `$`
    is literal, matching the de-facto Google semantics).
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
from pyspark.sql import functions as F
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


def rule_to_regex(pattern: str) -> str:
    """RFC 9309 rule pattern → anchored Java/RE2-compatible regex.
    `*` matches any char sequence; a TRAILING `$` anchors the end (a
    mid-pattern `$` is a literal octet, per the de-facto Google parser).
    Everything else is escaped literally."""
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [_re.escape(ch) if ch != "*" else ".*" for ch in body]
    return "^" + "".join(parts) + ("$" if anchored else "")


def split_rules(
    disallows: list[str], allows: list[str]
) -> tuple[list[tuple], list[tuple]]:
    """Rules → (plain, wild) precompiled tuples.

    plain = (prefix, octets, is_allow) matched by startswith;
    wild  = (regex, octets, is_allow) matched by regexp.
    `octets` is the RAW pattern's octet length (RFC 9309 precedence counts
    pattern octets, wildcards included). A rule whose only wildcard is a
    TRAILING run of `*` is still a plain prefix (match-equivalent), so the
    regex path stays reserved for genuinely wild rules."""
    plain: list[tuple] = []
    wild: list[tuple] = []
    for is_allow, rules in ((False, disallows), (True, allows)):
        for r in rules:
            octets = len(r.encode("utf-8"))
            stripped = r.rstrip("*")
            if "*" not in stripped and not stripped.endswith("$"):
                plain.append((stripped, octets, is_allow))
            else:
                wild.append((rule_to_regex(r), octets, is_allow))
    return plain, wild


_RULE_FIELDS_PLAIN = T.StructType(
    [
        T.StructField("p", T.StringType()),
        T.StructField("len", T.IntegerType()),
        T.StructField("allow", T.BooleanType()),
    ]
)
_RULE_FIELDS_WILD = T.StructType(
    [
        T.StructField("rx", T.StringType()),
        T.StructField("len", T.IntegerType()),
        T.StructField("allow", T.BooleanType()),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_s", T.DoubleType()),
        T.StructField("plain_rules", T.ArrayType(_RULE_FIELDS_PLAIN)),
        T.StructField("wild_rules", T.ArrayType(_RULE_FIELDS_WILD)),
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
                plain_t, wild_t = split_rules(prefixes, allows)
                plain = [
                    {"p": p, "len": ln, "allow": al} for p, ln, al in plain_t
                ]
                wild = [
                    {"rx": rx, "len": ln, "allow": al} for rx, ln, al in wild_t
                ]
                rows.append(
                    {
                        "host": host,
                        "disallow_prefixes": prefixes,
                        "allow_prefixes": allows,
                        "crawl_delay_s": delay,
                        "plain_rules": plain,
                        "wild_rules": wild,
                    }
                )
            yield pd.DataFrame(rows)

    return sel.mapInPandas(run, schema=ROBOTS_SCHEMA)


def sitemap_urls(
    bodies: "DataFrame",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> "DataFrame":
    """(host, sitemap_url) — one row per DISTINCT `Sitemap:` directive in
    each host's robots.txt: the crawl loop's third seed channel (after
    operator seed lists and extracted outlinks), per the sitemaps.org
    protocol. Sitemap lines are GROUP-INDEPENDENT — they apply to the
    whole file regardless of user-agent groups — so extraction is one
    line-anchored regexp_extract_all over the body: pure Catalyst,
    map-only, no shuffle beyond the caller's own layout.

    Field name matches case-insensitively, trailing comments are cut at
    '#', and only absolute http(s) URLs survive (the protocol requires
    absolute URLs; anything else is a malformed directive a crawler
    skips). Reference: no equivalent (commoncrawl-fetcher-lite reads
    existing index files and never touches robots.txt) — §8 scope.
    """
    urls = F.array_distinct(
        F.regexp_extract_all(
            F.col(body_col),
            F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^\s#]+)"),
            1,
        )
    )
    return (
        bodies.select(F.col(host_col), F.explode(urls).alias("sitemap_url"))
        .where(F.col("sitemap_url").rlike("^https?://"))
    )


# sitemaps.org <changefreq> → changes/day prior for the Poisson recrawl
# model (recrawl.py). The spec defines the vocabulary but not numbers;
# this is the natural days-based mapping, with 'always' above hourly and
# 'never' exactly 0 (recrawl_score then pins the page's score at 0 until
# an observed change — estimate_change_rate — overrides the prior).
CHANGEFREQ_RATES = {
    "always": 48.0,
    "hourly": 24.0,
    "daily": 1.0,
    "weekly": 1.0 / 7.0,
    "monthly": 1.0 / 30.0,
    "yearly": 1.0 / 365.0,
    "never": 0.0,
}


def parse_sitemap(
    bodies: "DataFrame",
    url_col: str = "sitemap_url",
    body_col: str = "xml",
    default_rate: float = 0.1,
) -> "DataFrame":
    """Parse fetched sitemap XML bodies into per-URL crawl hints:
    (sitemap_url, loc, lastmod, changefreq, priority, change_rate_prior)
    — one row per <url> entry; `change_rate_prior` maps <changefreq>
    through CHANGEFREQ_RATES (missing/unknown → `default_rate`) so the
    output joins the frontier as the rate column recrawl_score consumes
    BEFORE any fetch history exists (estimate_change_rate replaces the
    prior once the crawler has observed the page twice).

    Pure Catalyst: one regexp_extract_all for the <url> blocks
    (posexplode keeps sitemap order), one anchored regexp_extract per
    field inside the let-bound block — map-only, whole-stage codegen,
    same RE2-compatible dialect as the html operators. Tolerates
    attribute-bearing tags, whitespace, and missing optional fields
    (empty string → null-ish defaults). Sitemap INDEX files (<sitemapindex>)
    yield zero <url> rows by construction — feed their <loc>s back
    through the fetch loop."""
    from commoncrawl_fetcher_lite_spark.functions.letbind import let

    blocks = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?is)<url\b[^>]*>(.*?)</url>"), 1
    )

    def field(b, tag):
        return F.regexp_extract(
            b, rf"(?is)<{tag}\b[^>]*>\s*(.*?)\s*</{tag}>", 1
        )

    rate = F.lit(float(default_rate))
    for name, r in sorted(CHANGEFREQ_RATES.items()):
        rate = F.when(F.col("changefreq") == name, F.lit(r)).otherwise(rate)
    return (
        bodies.select(
            F.col(url_col).alias("sitemap_url"),
            F.posexplode(blocks).alias("entry_no", "_b"),
        )
        .select(
            "sitemap_url",
            "entry_no",
            let(
                F.col("_b"),
                lambda b: F.struct(
                    field(b, "loc").alias("loc"),
                    field(b, "lastmod").alias("lastmod"),
                    F.lower(field(b, "changefreq")).alias("changefreq"),
                    field(b, "priority").alias("priority"),
                ),
            ).alias("_e"),
        )
        .select("sitemap_url", "entry_no", "_e.*")
        .where(F.col("loc") != "")
        .withColumn("change_rate_prior", F.round(rate, 6))
    )
