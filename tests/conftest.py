from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from heritrix3_spark.session import get_spark

    # the session fixture hosts 300+ tests (hundreds of engine rounds) in
    # ONE driver JVM — local mode stores every cached/checkpointed block in
    # that heap, so give it headroom (the engine now also frees its round
    # frames deterministically; this covers test-local caches)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    s = get_spark(master="local[4]", app_name="h3s-tests", shuffle_partitions=4)
    yield s
