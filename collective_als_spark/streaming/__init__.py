from collective_als_spark.streaming.windows import (
    sessionize,
    streaming_tumbling_agg,
    tumbling_agg,
)

__all__ = ["sessionize", "streaming_tumbling_agg", "tumbling_agg"]
