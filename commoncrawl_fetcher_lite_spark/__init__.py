"""commoncrawl_fetcher_lite_spark — a PySpark-native crawl/fetch analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
tballison/commoncrawl-fetcher-lite (reference, read-only at /root/reference)
as idiomatic Spark: DataFrame/SQL plans compiled by Catalyst, vectorized
pandas/Arrow UDFs only where built-ins cannot express the semantics, and a
net-new URL-frontier layer (URL-seen dedup, politeness scheduling, priority
queues, checkpoint/resume) designed for 100 TB-scale index data.

Nothing here is a port: the reference is a threaded Java iterator pipeline;
this engine declares logical plans and lets Catalyst/Tungsten pick physical
strategies. Reference citations in docstrings are file:line into
/root/reference for semantics parity only.
"""

__version__ = "0.1.0"
