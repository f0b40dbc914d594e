from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawl_fetcher_lite_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_t1(tmp_path_factory):
    """t1 smoke fixture: 1,000 cdx lines (FIXTURES.md scales)."""
    from commoncrawl_fetcher_lite_spark import fixtures

    root = str(tmp_path_factory.mktemp("fx_t1"))
    return fixtures.generate(root, seed=42, n_lines=1000)


@pytest.fixture(scope="session")
def fixture_t2(tmp_path_factory):
    """t2 correctness fixture: 10,000 cdx lines."""
    from commoncrawl_fetcher_lite_spark import fixtures

    root = str(tmp_path_factory.mktemp("fx_t2"))
    return fixtures.generate(root, seed=42, n_lines=10_000)
