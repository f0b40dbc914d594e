"""Property-based tests (hypothesis): selector compiler ≡ oracle on random
records × random selector trees; path rewriter round-trip properties."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from commoncrawl_fetcher_lite_spark.functions.paths import rewrite_target_path_py
from commoncrawl_fetcher_lite_spark.operators.selector import apply_selector
from tests import oracle

MIMES = ["text/html", "application/pdf", "video/mp4", None]
STATUSES = ["200", "404", "302", None]

record_st = st.fixed_dictionaries(
    {
        "url": st.one_of(
            st.just("https://a.com/x.pdf"),
            st.just("https://b.org/y.exe"),
            st.just("http://c.net/z"),
            st.text(
                alphabet="abc/.:", min_size=1, max_size=20
            ).map(lambda s: f"https://h.com/{s}"),
        ),
        "mime": st.sampled_from(MIMES),
        "mime-detected": st.sampled_from(MIMES),
        "status": st.sampled_from(STATUSES),
        "digest": st.sampled_from(["D1", "D2", None]),
        "truncated": st.sampled_from([None, "length", "time"]),
    }
)

clause_st = st.one_of(
    st.fixed_dictionaries(
        {"match": st.sampled_from(["text/html", "200", "D1", "video/mp4"])},
        optional={"case_sensitive": st.booleans()},
    ),
    st.fixed_dictionaries(
        {"pattern": st.sampled_from(["pdf", "^https", "a\\.com", "e$"])},
        optional={"sample": st.sampled_from([0.3, 0.7])},
    ),
    st.fixed_dictionaries(
        {"extensions": st.sampled_from(["pdf,exe", "html", "EXE"])},
        optional={"sample": st.sampled_from([0.5])},
    ),
)

field_st = st.sampled_from(["mime_detected", "mime", "status", "url", "digest", "truncated"])
bucket_st = st.dictionaries(field_st, st.lists(clause_st, min_size=1, max_size=2), max_size=2)
selector_st = st.fixed_dictionaries(
    {}, optional={"must": bucket_st, "must_not": bucket_st, "should": bucket_st}
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(records=st.lists(record_st, min_size=1, max_size=8), selector=selector_st)
def test_selector_matches_oracle(spark, records, selector):
    rows = [
        (
            i,
            r["url"],
            r["mime"],
            r["mime-detected"],
            int(r["status"]) if r["status"] else None,
            r["digest"],
            r["truncated"],
        )
        for i, r in enumerate(records)
    ]
    df = spark.createDataFrame(
        rows,
        "rid int, url string, mime string, mime_detected string, "
        "status int, digest string, truncated string",
    )
    got = {r["rid"] for r in apply_selector(df, selector, seed=42).select("rid").collect()}
    want = set()
    for i, r in enumerate(records):
        rec = dict(r)
        rec.setdefault("length", None)
        rec.setdefault("offset", None)
        rec.setdefault("filename", None)
        rec.setdefault("charset", None)
        rec.setdefault("languages", None)
        rec.setdefault("redirect", None)
        if oracle.select(rec, selector, seed=42):
            want.add(i)
    assert got == want, (selector, records)


@settings(max_examples=200, deadline=None)
@given(
    digest=st.text(alphabet="0123456789abcdef", min_size=8, max_size=64),
    seg_lens=st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=4),
)
def test_path_rewriter_properties(digest, seg_lens):
    # build a pattern like 'xx/xxx/x/…/xx' from segment lengths (no
    # leading/trailing slash; empty segments allowed mid-pattern)
    pattern = "/".join("x" * n for n in seg_lens) + ("/xx" if seg_lens else "xx")
    if pattern.startswith("/"):
        pattern = "x" + pattern
    out = rewrite_target_path_py(digest, pattern)
    # 1. always ends with the FULL original digest
    assert out.endswith(digest)
    # 2. slash count equals pattern's slash count
    assert out.count("/") == pattern.count("/")
    # 3. removing slashes reproduces prefix+digest (segments are prefixes)
    assert out.replace("/", "").endswith(digest)
    # 4. oracle twin agrees
    assert oracle._rewrite(digest, pattern) == out
