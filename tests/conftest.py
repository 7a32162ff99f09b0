import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from log_parser_project_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", parallelism=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_small(spark):
    """t1-smoke tier: ~100 convs, deterministic (FIXTURES.md §1)."""
    from log_parser_project_spark.generate import make_transcripts

    df = make_transcripts(spark, n_convs=100)
    df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
