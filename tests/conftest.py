from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dynamic_etl_pipeline_spark.session import get_spark  # noqa: E402

SMOKE_SF = "/root/testdata/sf0.001"
FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("dynamic-etl-pipeline-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    return FIXTURES
