"""Selector JSON → Catalyst Column compiler.

The reference's only query surface is a three-bucket boolean clause tree
evaluated per record (selector/RecordSelector.java:42-84). We compile the
whole tree to ONE boolean Column at plan time — no UDF, no per-row Python —
so Catalyst can push it into the parquet/text scan and codegen it.

Exact reference semantics reproduced (citations):
  * must_not first: for each FIELD, null value → field skipped entirely
    (warn+continue, RecordSelector.java:44-47); any clause match → reject.
  * must: null field value → reject (:57-61); ALL clauses of every field
    must match (:62-66).
  * should: empty bucket → accept (:68-70); null field value → field
    skipped (:73-76); ≥1 clause match anywhere → accept; none → reject.
  * field whitelist mime_detected|truncated|mime|status|url|host|digest;
    status stringified; unknown key → error at COMPILE time (:87-107 throws
    at eval time; we fail earlier, strictly better).
  * match clause: equals / equalsIgnoreCase; constructed with a sampler but
    NEVER consults it (MatchSelector.java:40-51) — the documented-vs-actual
    quirk is reproduced: `sample` on a match clause is ignored.
  * regex clause: Pattern.find substring semantics (rlike), THEN sample
    gate (RegexSelector.java:38-44).
  * extensions clause: commons-io getExtension of the value, case-
    insensitive set membership, THEN sample gate (ExtensionsSelector.java:47-55);
    blank extension → false.
  * sampling: deterministic seeded hash gate replacing the reference's
    unseeded Random (AbstractSamplingSelector.java:40-55) — see
    functions/sampling.py.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawl_fetcher_lite_spark.functions.sampling import sample_gate
from commoncrawl_fetcher_lite_spark.functions.urls import commons_extension, host_of

SELECTOR_FIELDS = (
    "mime_detected",
    "truncated",
    "mime",
    "status",
    "url",
    "host",
    "digest",
)

# (json) -> Column builders keyed by clause discriminator — the engine's
# extension point, mirroring the reference's Jackson polymorphic deduction
# (SelectorClause.java:22-25). Register new clause kinds here.
ClauseBuilder = Callable[[Column, Mapping[str, Any], str, int], Column]


def _match_clause(val: Column, clause: Mapping[str, Any], cid: str, seed: int) -> Column:
    target = str(clause["match"])
    case_sensitive = clause.get("case_sensitive", True)
    if case_sensitive:
        expr = val == F.lit(target)
    else:
        expr = F.lower(val) == F.lit(target.lower())
    # MatchSelector.java:40-51 never consults its sampler: no sample gate.
    return expr


def _regex_clause(val: Column, clause: Mapping[str, Any], cid: str, seed: int) -> Column:
    expr = val.rlike(str(clause["pattern"]))  # rlike = find() semantics
    return _with_sample(expr, val, clause, cid, seed)


def _extensions_clause(
    val: Column, clause: Mapping[str, Any], cid: str, seed: int
) -> Column:
    exts = [
        e.strip().lower()
        for e in str(clause["extensions"]).split(",")
        if e.strip()
    ]
    ext = F.lower(commons_extension(val))
    expr = (ext != "") & ext.isin(exts)
    return _with_sample(expr, val, clause, cid, seed)


def _with_sample(
    expr: Column, val: Column, clause: Mapping[str, Any], cid: str, seed: int
) -> Column:
    sample = clause.get("sample")
    if sample is None:
        return expr
    return expr & sample_gate(val, float(sample), cid, seed)


CLAUSE_BUILDERS: dict[str, ClauseBuilder] = {
    "match": _match_clause,
    "pattern": _regex_clause,
    "extensions": _extensions_clause,
}


def _build_clause(
    val: Column, clause: Mapping[str, Any], cid: str, seed: int
) -> Column:
    for key, builder in CLAUSE_BUILDERS.items():
        if key in clause:
            return builder(val, clause, cid, seed)
    raise ValueError(f"unknown selector clause: {dict(clause)!r}")


def field_value(field: str, columns: Mapping[str, Column] | None = None) -> Column:
    """Resolve a selector field name to its (string-typed) Column.

    RecordSelector.java:87-107: status stringified, host derived from url,
    unknown key → error. `columns` overrides the default column mapping so
    the same selector compiles against any table shape."""
    if field not in SELECTOR_FIELDS:
        raise ValueError(f"Don't yet support key {field}")
    if columns and field in columns:
        return columns[field]
    if field == "status":
        return F.col("status").cast("string")
    if field == "host":
        return host_of(F.col("url"))
    return F.col(field)


def compile_selector(
    selector: Mapping[str, Any] | None,
    columns: Mapping[str, Column] | None = None,
    seed: int = 42,
) -> Column:
    """Compile the must/must_not/should tree into one boolean Column."""
    if not selector:
        return F.lit(True)  # ACCEPT_ALL (RecordSelector.java:32)

    for bucket in selector:
        if bucket not in ("must", "must_not", "should"):
            raise ValueError(f"unknown selector bucket {bucket!r}")

    parts: list[Column] = []

    # must_not: reject if (value non-null AND any clause matches)
    for field, clauses in (selector.get("must_not") or {}).items():
        val = field_value(field, columns)
        any_match = None
        for i, clause in enumerate(clauses):
            cid = f"must_not.{field}.{i}"
            e = _build_clause(val, clause, cid, seed)
            any_match = e if any_match is None else (any_match | e)
        if any_match is not None:
            # null value → field skipped (no reject): coalesce(match, False)
            parts.append(~F.coalesce(val.isNotNull() & any_match, F.lit(False)))

    # must: value must be non-null AND every clause matches
    for field, clauses in (selector.get("must") or {}).items():
        val = field_value(field, columns)
        cond = val.isNotNull()
        for i, clause in enumerate(clauses):
            cid = f"must.{field}.{i}"
            cond = cond & F.coalesce(
                _build_clause(val, clause, cid, seed), F.lit(False)
            )
        parts.append(F.coalesce(cond, F.lit(False)))

    # should: if bucket non-empty, at least one (non-null-field) clause matches
    should = selector.get("should") or {}
    if should:
        any_should: Column | None = None
        for field, clauses in should.items():
            val = field_value(field, columns)
            for i, clause in enumerate(clauses):
                cid = f"should.{field}.{i}"
                e = val.isNotNull() & _build_clause(val, clause, cid, seed)
                e = F.coalesce(e, F.lit(False))
                any_should = e if any_should is None else (any_should | e)
        if any_should is not None:
            parts.append(any_should)

    if not parts:
        return F.lit(True)
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def apply_selector(
    df: DataFrame,
    selector: Mapping[str, Any] | None,
    columns: Mapping[str, Column] | None = None,
    seed: int = 42,
) -> DataFrame:
    return df.where(compile_selector(selector, columns, seed))
