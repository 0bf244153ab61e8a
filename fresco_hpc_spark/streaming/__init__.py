from fresco_hpc_spark.streaming.dedup import (  # noqa: F401
    start_incremental_ingest,
    start_incremental_media_ingest,
    start_incremental_vector_ingest,
    streaming_dedup,
)
from fresco_hpc_spark.streaming.search import (  # noqa: F401
    process_text_index_batch,
    start_incremental_text_index,
)
from fresco_hpc_spark.streaming.vectors import (  # noqa: F401
    process_ivf_ingest_batch,
    process_kmeans_assign_batch,
    process_semdedup_batch,
    start_incremental_ivf_ingest,
    start_incremental_kmeans_assign,
    start_incremental_semdedup,
)
from fresco_hpc_spark.streaming.stateful import (  # noqa: F401
    streaming_counter_rates,
    streaming_ewma,
    streaming_holt,
    streaming_ks_reference,
    streaming_scd2_state,
    streaming_weighted_sample,
)
from fresco_hpc_spark.streaming.watcher import (  # noqa: F401
    exactly_once_store_writer,
    start_etl_stream,
    stream_csv_directory,
    streaming_hopping_agg,
    streaming_hourly_agg,
    streaming_ohlc,
    streaming_session_agg,
)
from fresco_hpc_spark.streaming.enrich import (  # noqa: F401
    enrich_with_static,
)
from fresco_hpc_spark.streaming.sketches import (  # noqa: F401
    process_hll_ingest_batch,
    process_kmv_ingest_batch,
    start_incremental_hll_ingest,
    start_incremental_kmv_ingest,
)
