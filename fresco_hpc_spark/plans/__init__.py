from fresco_hpc_spark.plans.cache import (  # noqa: F401
    QueryCache,
)
from fresco_hpc_spark.plans.planner import (  # noqa: F401
    MissingTimeRangeError,
    QueryPlan,
    execute,
    extract_filters,
    extract_projections,
    extract_time_range,
    plan_query,
    required_hours,
)
from fresco_hpc_spark.plans.store import (  # noqa: F401
    PARTITION_COLS,
    compact_store,
    list_partition_files,
    merge_into_store,
    read_partitioned_store,
    write_bucketed_table,
    write_partitioned_store,
    zorder_by,
)
