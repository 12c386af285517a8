from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from mister_spark import get_session

    s = get_session("mister_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
