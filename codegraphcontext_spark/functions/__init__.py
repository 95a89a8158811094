"""Vectorized (Arrow-batched) function surface: multimodal decode stubs and
any future pandas-UDF stages that can't be expressed with built-in
``pyspark.sql.functions``."""
