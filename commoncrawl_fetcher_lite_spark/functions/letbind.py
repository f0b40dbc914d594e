"""let-binding for Catalyst expressions.

Catalyst collapses adjacent projections, INLINING a withColumn'd expression
into every downstream reference — an expensive array expression referenced
k times is then evaluated k times per row (codegen subexpression
elimination does not cover higher-order array functions). `let` binds the
value once per row using the HOF evaluation contract:

    transform(array(e), x -> body)   # e is evaluated ONCE to build the array

so `let(e, lambda x: body)` == body[x := e] with e computed once. Nesting
works because lambda variables are bound values, not expressions.

Measured effect (sf0.1 bench, 32 cores): minhash signature 64 refs → one
eval cut the minhash_lsh query ~4x; fingerprints ~5x.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate `expr` once per row and feed the bound value to `body`."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def spread_for_compute(df, min_partitions: int | None = None):
    """Round-robin repartition before CPU-heavy per-row work.

    Small-file inputs arrive as 1-2 scan partitions; a signature/hashing
    stage then runs on 1-2 cores no matter the cluster size. One cheap
    shuffle (rows pass through once) buys full-width parallelism for the
    expensive stage.

    NEVER narrows: an input that already has >= target partitions is
    returned unchanged — a 100 TB scan arrives with far more partitions
    than defaultParallelism, and collapsing it here would both throttle
    the most CPU-expensive stages (shingling, simhash, signature matmuls)
    to ~#cores AND round-robin-shuffle the full text/vector payload to do
    it. The guard lives in the helper itself so every call site gets it."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    existing = df.rdd.getNumPartitions()
    if existing >= target:
        return df
    return df.repartition(target)
