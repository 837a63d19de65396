import pytest

from teste_carga_avro_vs_json_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
