from __future__ import annotations

import pytest

from distributed_crawl_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("dcs-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
