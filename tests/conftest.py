import pytest

from spectrify_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spectrify-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
