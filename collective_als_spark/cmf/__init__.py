from collective_als_spark.cmf.als import CollectiveALS, CollectiveALSModel

__all__ = ["CollectiveALS", "CollectiveALSModel"]
