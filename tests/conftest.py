from __future__ import annotations

import pytest

from engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tsad-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    return "/root/testdata/sf0.01"
