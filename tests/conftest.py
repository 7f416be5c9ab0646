from __future__ import annotations

import pytest

from real_time_weather_data_pipeline_for_philippine_cities_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rtw-tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
