"""Shared fixtures: one SparkSession, one smoke corpus, one pipeline run per
session (the analog of the reference's module-scoped indexed_project fixture,
reference tests/conftest.py:100-132)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codegraphcontext_spark.datagen.pages import generate_corpus  # noqa: E402
from codegraphcontext_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cgc-spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("corpus") / "smoke")
    generate_corpus(out, 200)
    return out


@pytest.fixture(scope="session")
def pipeline_out(spark, corpus_dir, tmp_path_factory):
    from codegraphcontext_spark.pipeline.runner import run_pipeline

    wd = str(tmp_path_factory.mktemp("workdir"))
    return run_pipeline(spark, os.path.join(corpus_dir, "pages.parquet"), wd)


def golden(spark, corpus_dir: str, name: str):
    return spark.read.parquet(os.path.join(corpus_dir, f"golden_{name}.parquet"))
