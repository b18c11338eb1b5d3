import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from list_extractor_spark.engine.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
