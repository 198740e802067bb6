from __future__ import annotations

import pytest

from teleharvest_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="teleharvest_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def suite():
    from teleharvest_spark import datagen
    from teleharvest_spark.config import CheckSuite

    return CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
    )


@pytest.fixture(scope="session")
def sequences(spark, suite):
    from teleharvest_spark import datagen

    return datagen.generate_sequences(spark, 20_000, suite).cache()
