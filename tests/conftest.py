from __future__ import annotations

import pandas as pd
import pytest

from lbf_spark import fixtures
from lbf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lbf_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_events() -> pd.DataFrame:
    # 2 entities × ~500 rows — mirrors the reference's 499-site test BEDs
    return fixtures.generate_events(n_rows=1000, n_entities=2)


@pytest.fixture(scope="session")
def small_events() -> pd.DataFrame:
    return fixtures.generate_events(n_rows=6000, n_entities=10)


@pytest.fixture(scope="session")
def tiny_anchors(tiny_events) -> pd.DataFrame:
    return fixtures.generate_anchors(tiny_events, n_per_entity=10)


@pytest.fixture(scope="session")
def small_anchors(small_events) -> pd.DataFrame:
    return fixtures.generate_anchors(small_events, n_per_entity=15)
