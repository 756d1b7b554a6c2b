from lambda_refarch_mapreduce_spark.streaming.events import (  # noqa: F401
    incremental_sum,
    read_event_stream,
    windowed_agg,
)
