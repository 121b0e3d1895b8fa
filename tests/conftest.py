import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from batch_process_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/spark-tests-wh"},
    )
    yield s
    s.stop()


def rows_set(df):
    """Order-insensitive row multiset as sorted tuples (for asserts)."""
    return sorted(tuple(r) for r in df.collect())
