"""A5 progress reporting (CCFileExtractorRecordProcessor.java:44-54: the
reference logs every 100k records processed).

Spark's analog is per-task: each executor task ticks its own counter and
logs through the worker's Python logger every `every` rows. Non-semantic
(pure operator telemetry — results are identical with it off), but it is
the operational heartbeat a multi-hour 100 TB fetch needs; cluster log
aggregation turns the per-task lines into the reference's single stream.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("commoncrawl_fetcher_lite_spark.progress")


class ProgressTicker:
    """Counts rows and logs at every `every` crossing (reference default
    100k). add() may receive whole batch sizes — crossings inside a batch
    are still reported once each."""

    def __init__(self, label: str, every: int = 100_000):
        self.label = label
        self.every = max(1, int(every))
        self.count = 0

    def add(self, n: int) -> None:
        if n <= 0:
            return
        before = self.count // self.every
        self.count += n
        after = self.count // self.every
        for k in range(before + 1, after + 1):
            logger.info("%s: processed %d records", self.label, k * self.every)
