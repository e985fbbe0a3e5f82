from mapreduce_rs_spark.streaming.pipeline import (  # noqa: F401
    run_windowed_stream,
    streaming_tumbling_counts,
)
