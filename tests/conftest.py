from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from distributed_lsh_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    from distributed_lsh_spark.fixtures import make_pages_corpus

    return make_pages_corpus(n_rows=200, seed=42)
