import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dxa_pagerank_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small core/partition counts: unit graphs are tiny and the iterative
    # loops pay per-task scheduler overhead per superstep.
    s = get_spark(
        app_name="dxa_pagerank_spark_tests",
        cores=8,
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s
