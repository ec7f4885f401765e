from collective_als_spark.operators.split import split_chronologically

__all__ = ["split_chronologically"]
