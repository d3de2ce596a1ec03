from __future__ import annotations

import os

import pytest

from psyndex2linkeddata_spark.datagen.authorities import write_authority_parquets
from psyndex2linkeddata_spark.datagen.pages import write_pages_parquet
from psyndex2linkeddata_spark.session import get_spark

N_FIXTURE_PAGES = 300


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic pages + authority parquet fixtures (seed=42)."""
    d = tmp_path_factory.mktemp("fixtures")
    write_pages_parquet(str(d / "pages.parquet"), N_FIXTURE_PAGES, seed=42)
    write_authority_parquets(str(d), N_FIXTURE_PAGES, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def pages(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))


@pytest.fixture(scope="session")
def records(spark, pages):
    from psyndex2linkeddata_spark.extract.parser import extract_records

    df = extract_records(pages, keep_page_cols=True)
    df.cache().count()
    return df
