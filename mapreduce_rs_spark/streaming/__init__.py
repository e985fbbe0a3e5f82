from mapreduce_rs_spark.streaming.pipeline import (  # noqa: F401
    run_streaming_neardup_ingest,
    run_windowed_stream,
    streaming_tumbling_counts,
)
