"""Domain blocklist filtering for the crawl frontier (UT1/adult-list
style): drop or tag candidates whose host — or any parent domain — is on
a category blocklist. The FineWeb/RefinedWeb pipelines run exactly this
gate before fetch; the reference has no equivalent (its selector F1-F8
matches single fields, not domain hierarchies), so this is §8 scope.

Scale shape: a blocklist is a small dimension (UT1 is ~4M domains,
megabytes) against a 10^10-row candidate frame — the canonical
broadcast-join case. The candidate host explodes into its parent-domain
suffixes (bounded by label count, ≤ ~10 per host, never corpus-shaped),
equi-joins the broadcast list, and the most-specific (longest) match
wins. No shuffle touches the candidate frame beyond the map-side
explode; the aggregation back to one-row-per-candidate groups on the
candidate id with at most #labels rows per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domain_suffixes(host: Column | str, min_labels: int = 2) -> Column:
    """All parent-domain suffixes of a host with >= min_labels labels:
    'a.b.example.com' -> ['a.b.example.com', 'b.example.com',
    'example.com']. min_labels=2 excludes bare TLDs — a 'com' blocklist
    row matching the entire web is never what a list author means."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    # guard: Spark's sequence(1, 0) counts DOWN to [1, 0]; a host with
    # fewer than min_labels labels must yield an empty array instead
    return F.when(
        n >= min_labels,
        F.transform(
            F.sequence(F.lit(1), n - (min_labels - 1)),
            lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def tag_blocked(
    candidates: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    list_host_col: str = "domain",
    category_col: str = "category",
    min_labels: int = 2,
    broadcast_verdict: bool | None = None,
) -> DataFrame:
    """Adds (blocked, block_domain, block_category) to every candidate
    row: blocked iff the host or any parent domain appears in the
    blocklist; on multiple matches the LONGEST (most specific) domain
    wins — so an 'example.com' -> ads row and a 'shop.example.com' ->
    commerce row tag shop.example.com as commerce, everything else under
    example.com as ads. If a list carries the SAME domain under several
    categories (UT1 category files genuinely overlap), the
    lexicographically smallest category wins — one struct-min aggregate,
    so the verdict is a pure function of the list (rerun/partitioning
    invariant, like every other operator here), never an arbitrary
    min_by tie.

    The blocklist frame is (domain, category); it is always broadcast —
    by construction it is the small dim (a list large enough to defeat
    broadcast belongs in the bucketed urlseen machinery instead). The
    per-HOST verdict frame is NOT force-broadcast: its size is bounded
    by candidate host diversity (every subdomain of a blocked domain is
    a distinct row — tens of millions is realistic at crawl scale), so
    it goes through the stats-gated maybe_broadcast and degrades to a
    shuffle join when it outgrows the threshold. `broadcast_verdict`
    overrides the gate (True/False) for callers whose verdict frame has
    no Catalyst stats but a known size — the apply_robots(broadcast=)
    pattern."""
    cand_cols = candidates.columns
    if host_col not in cand_cols:
        raise ValueError(f"tag_blocked: candidates lack {host_col!r}")
    # DNS names are case-insensitive and a FQDN may carry a trailing dot:
    # normalize BOTH sides at match time (lowercase + strip trailing dot)
    # so `https://Evil.Example.COM/` cannot bypass a lowercase UT1 entry.
    # The candidate's original host column is untouched — only the match
    # key is normalized.
    _norm = lambda c: F.lower(F.regexp_replace(c, r"\.$", ""))  # noqa: E731
    bl = F.broadcast(
        blocklist.select(
            _norm(F.col(list_host_col)).alias("_bl_domain"),
            F.col(category_col).alias("_bl_category"),
        )
    )
    # explode suffixes of DISTINCT hosts only — hosts repeat heavily in a
    # candidate frame, and map-side partial distinct shrinks the exchange
    # to |hosts| long before the ≤#labels-per-host explode runs.
    exploded = (
        candidates.select(host_col)
        .distinct()
        .select(
            host_col,
            F.posexplode(
                domain_suffixes(_norm(F.col(host_col)), min_labels)
            ).alias("_sfx_pos", "_sfx"),
        )
    )
    # most-specific match = suffix generated earliest (pos 0 is the full
    # host); one struct-min is lexicographic over (pos, category, domain),
    # so category ties on the same domain resolve deterministically
    matched = (
        exploded.join(bl, exploded["_sfx"] == bl["_bl_domain"])
        .groupBy(host_col)
        .agg(
            F.min(
                F.struct(
                    F.col("_sfx_pos"), F.col("_bl_category"), F.col("_bl_domain")
                )
            ).alias("_best")
        )
        .select(
            host_col,
            F.col("_best._bl_domain").alias("block_domain"),
            F.col("_best._bl_category").alias("block_category"),
        )
    )
    from commoncrawl_fetcher_lite_spark.functions.joins import maybe_broadcast

    # join the per-HOST verdict back; stats-gated broadcast (see docstring)
    if broadcast_verdict is True:
        matched = F.broadcast(matched)
    elif broadcast_verdict is None:
        matched = maybe_broadcast(matched)
    out = candidates.join(matched, host_col, "left")
    return out.select(
        *cand_cols,
        F.col("block_domain").isNotNull().alias("blocked"),
        "block_domain",
        "block_category",
    )


def filter_blocked(
    candidates: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    list_host_col: str = "domain",
    category_col: str = "category",
    min_labels: int = 2,
    broadcast_verdict: bool | None = None,
) -> DataFrame:
    """Drops blocked candidates (the fetch-path gate); column set is
    unchanged. Use tag_blocked when the categories themselves feed a
    report or a quarantine sink."""
    tagged = tag_blocked(
        candidates,
        blocklist,
        host_col=host_col,
        list_host_col=list_host_col,
        category_col=category_col,
        min_labels=min_labels,
        broadcast_verdict=broadcast_verdict,
    )
    return tagged.where(~F.col("blocked")).select(*candidates.columns)
