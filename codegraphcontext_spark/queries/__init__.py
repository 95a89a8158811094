from .driver_queries import ORACLE_SQL, SPARK_QUERIES, flagship

__all__ = ["ORACLE_SQL", "SPARK_QUERIES", "flagship"]
