from fresco_hpc_spark.operators.stats import (  # noqa: F401
    availability,
    check_constraints,
    column_stats,
    fk_audit,
    linear_trend,
    profile_columns,
    standardize,
    time_extent,
)
from fresco_hpc_spark.operators.timeseries import (  # noqa: F401
    duration_seconds,
    ewma,
    ewma_scan,
    cusum_drift,
    holt_scan,
    gap_fill,
    hopping_window_agg,
    hourly_agg,
    interpolate_linear,
    profile_agg,
    ohlc_downsample,
    rolling_zscore,
    seasonal_profile,
    session_stats,
    sessionize,
    time_bound,
    time_bucket_agg,
    time_weighted_avg,
    transition_matrix,
)
from fresco_hpc_spark.operators.percentiles import (  # noqa: F401
    approx_percentiles_certified,
    global_percentiles,
    grouped_cume_counts,
    grouped_approx_percentiles_certified,
    grouped_exact_percentiles,
    grouped_value_cdf,
    iqr_trim,
    ks_vs_reference,
    ks_vs_rest,
    ks_vs_rest_quantized,
    mad_trim,
    percentile_trim,
    percentile_trimmed_hourly_agg,
    quantile_bucket,
    quantile_normalize,
    weighted_quantiles,
    winsorize,
)
from fresco_hpc_spark.operators.topn import (  # noqa: F401
    category_counts,
    nucleus_top_p,
    topk_per_group,
    topn_others,
)
from fresco_hpc_spark.operators.histogram import (  # noqa: F401
    equi_depth_histogram,
    histogram2d,
    histogram_bin_index,
    histogram_range_join,
)
from fresco_hpc_spark.operators.joins import (  # noqa: F401
    anti_join,
    asof_join,
    broadcast_dim_join,
    fuzzy_match_names,
    interval_join,
    large_equi_join,
    salted_join,
    semi_join,
    sorted_neighborhood_pairs,
)
from fresco_hpc_spark.operators.graph import (  # noqa: F401
    label_propagation,
    local_clustering_coefficient,
    pagerank_fixed_point,
    triangle_enumerate,
)
from fresco_hpc_spark.operators.cdc import (  # noqa: F401
    scd2_history,
)
from fresco_hpc_spark.operators.funnel import (  # noqa: F401
    attribution_linear,
    cohort_retention,
    funnel_counts,
)
from fresco_hpc_spark.operators.pivot import (  # noqa: F401
    pivot_long_to_wide,
    unpivot_wide_to_long,
)
from fresco_hpc_spark.operators.projections import (  # noqa: F401
    cast_double_view,
    scaled_view,
    zero_fill_missing,
)
