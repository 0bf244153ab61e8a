from fresco_hpc_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_csv_tolerant,
    read_jsonl_tolerant,
    read_parquet,
    table,
)
from fresco_hpc_spark.sources.discovery import (  # noqa: F401
    discover_files,
    discover_month_folders,
)
from fresco_hpc_spark.sources.http_fetch import (  # noqa: F401
    discover_http_folders,
    fetch_http_files,
)
from fresco_hpc_spark.sources.synthetic import (  # noqa: F401
    SYNTHETIC_ORACLE_SQL_TEMPLATE,
    ZIPF_CORPUS_ORACLE_SQL_TEMPLATE,
    synthetic_job_data,
    zipf_corpus,
)
from fresco_hpc_spark.sources.writers import (  # noqa: F401
    export_csv,
    export_jsonl,
    write_chunked_parquet,
    validate_output,
)
from fresco_hpc_spark.sources.archive import (  # noqa: F401
    generate_archives,
)
