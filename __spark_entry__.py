"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query over /root/testdata/sf0.001.
queries()     -> one entry per implemented operator (SURVEY.md §2 analogs +
                 training-data-pipeline ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()  -> DuckDB twin per query (tables pre-registered as views).

Implementations live in codegraphcontext_spark/queries/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from codegraphcontext_spark.queries.driver_queries import (  # noqa: E402
    ORACLE_SQL,
    SPARK_QUERIES,
    flagship,
)
import codegraphcontext_spark.queries.graph_queries  # noqa: E402,F401  (registers kg_graph_*)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: who-references ('spark') over sf0.001 documents."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
