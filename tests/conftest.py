"""Shared fixtures: one SparkSession per test session + tiny corpus."""

from __future__ import annotations

import pytest

from paddle_spark.plans import build_session
from paddle_spark.sources.synth import gen_pages_pdf

TINY_ROWS = 200
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = build_session("paddle_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tiny_pages_pdf():
    return gen_pages_pdf(TINY_ROWS, seed=SEED)


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="session")
def tiny_pages(spark, tiny_pages_pdf):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(tiny_pages_pdf, schema=schema)
