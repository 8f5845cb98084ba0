from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legendary_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("LDP_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_CORRECTNESS = os.environ.get("LDP_TEST_SF_DIR_T2", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="ldp-tests",
        master=f"local[{os.environ.get('LDP_TEST_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
