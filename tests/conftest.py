from __future__ import annotations

import os

import pytest

from real_time_weather_data_pipeline_for_philippine_cities_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Python workers must be able to import test modules (mapInPandas fetchers
# defined in tests are pickled by reference). Must be set before the JVM /
# worker daemon starts.
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (os.environ.get("PYTHONPATH"), _TESTS_DIR, os.path.dirname(_TESTS_DIR)) if p
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rtw-tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
