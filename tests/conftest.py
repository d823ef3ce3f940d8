from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from heritrix3_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="h3s-tests", shuffle_partitions=4)
    yield s
