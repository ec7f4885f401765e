"""collective_als_spark — a PySpark-native analytics + CMF engine.

A from-scratch rebuild of the capabilities of the reference library
``jongwook/collective-als`` (a Scala/Spark Collective Matrix
Factorization library extending MLlib ALS to N entities), expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, Arrow-batched
pandas UDFs only for the per-block normal-equation solves, and a set
of large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) on top.

Layout:
  session      — tuned SparkSession builder
  sources      — testdata / file readers
  functions    — scalar & vector column expressions (UDF-free where possible)
  operators    — relational + pipeline operators (split, metrics, dedup, ...)
  cmf          — CollectiveALS / CollectiveALSModel (the reference's core)
  streaming    — Structured Streaming operators
"""

from collective_als_spark.cmf import CollectiveALS, CollectiveALSModel
from collective_als_spark.session import get_spark

__all__ = ["CollectiveALS", "CollectiveALSModel", "get_spark"]
__version__ = "0.1.0"
