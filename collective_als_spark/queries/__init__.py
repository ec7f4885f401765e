"""Import all query modules so their @register calls populate the registry."""

from collective_als_spark.queries import relational  # noqa: F401
