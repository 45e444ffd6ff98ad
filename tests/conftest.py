from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgeng.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgeng-tests", cpus=4, shuffle_partitions=4)
    yield s


SF_DIR = os.environ.get("KGENG_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("KGENG_ORACLE_SF_DIR", "/root/testdata/sf0.01")
