import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession (JVM startup amortized across tests)."""
    from sparkhtml.spark.session import get_spark

    spark = get_spark(app_name="sparkhtml-tests", cpus=4, shuffle_partitions=4)
    yield spark
