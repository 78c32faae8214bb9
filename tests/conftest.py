import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")


@pytest.fixture(scope="session")
def spark():
    from recordlinkage_spark.config import get_spark

    s = get_spark("recordlinkage-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def idx_frames(spark):
    """FIXTURES.md F2: closed-form pair-count frames
    (tests/test_indexing.py:36-73 pattern)."""
    def mk(n, prefix):
        rows = [
            (f"{prefix}{i:03d}", 1, i, str(i), i // 10)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "id string, var_single int, var_arange int, var_arange_str string, var_block10 int"
        )

    return mk(100, "rec_a_"), mk(150, "rec_b_")
