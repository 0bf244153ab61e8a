from fresco_hpc_spark.etl.transformers import (  # noqa: F401
    block_io_rates,
    cpu_user_percent,
    memory_metrics,
    nfs_rates,
    transformer_for_filename,
)
from fresco_hpc_spark.etl.pipeline import (  # noqa: F401
    run_batch_pipeline,
)
from fresco_hpc_spark.etl.synthetic_raw import (  # noqa: F401
    raw_block_from_events,
    raw_cpu_from_events,
    raw_llite_from_events,
    raw_mem_from_events,
)
from fresco_hpc_spark.etl.generic import (  # noqa: F401
    CompositeTransformer,
    add_unit_column,
    column_reorder,
    normalize_timestamps,
    schema_standardize,
    string_normalize,
    suffix_transform,
)
