from collective_als_spark.functions.vector import (
    checked_cast,
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)

__all__ = ["checked_cast", "cosine_similarity", "dot", "l2_norm", "l2_normalize"]
