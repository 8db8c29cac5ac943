import os
import shutil

import pytest

from micce_search_engine_spark.corpus import gen_pages, gen_queries, gen_synonyms
from micce_search_engine_spark.oracle import BruteForceBM25
from micce_search_engine_spark.session import get_spark

TINY_N = 1000


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages_pdf():
    return gen_pages(TINY_N, seed=42)


@pytest.fixture(scope="session")
def synonyms():
    return dict(gen_synonyms())


@pytest.fixture(scope="session")
def queries_pdf():
    return gen_queries(seed=42, n=100)


@pytest.fixture(scope="session")
def oracle(tiny_pages_pdf):
    return BruteForceBM25(tiny_pages_pdf)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_pages_pdf, tmp_path_factory):
    """Index built once over the tiny corpus; shared by query tests."""
    from micce_search_engine_spark.corpus import pages_spark_schema
    from micce_search_engine_spark.operators.index_build import build_index

    index_dir = str(tmp_path_factory.mktemp("index") / "tiny")
    pages = spark.createDataFrame(tiny_pages_pdf, schema=pages_spark_schema())
    build_index(spark, pages, index_dir, n_buckets=8, max_postings_per_row=300)
    yield index_dir
    shutil.rmtree(index_dir, ignore_errors=True)
