from fresco_hpc_spark.streaming.watcher import (  # noqa: F401
    start_etl_stream,
    stream_csv_directory,
    streaming_hourly_agg,
)
