"""SparkSession factory with the engine's canonical configuration.

Mirrors the reference's per-connection session setup (``LOAD icu; SET
TimeZone=...`` + memory/thread pragmas — web/src/util/client.ts:45-46,
web/src/context/DuckDBContext.tsx:82-91) as Spark session confs.

The session timezone defaults to UTC so that ``date_trunc`` bucketing of
naive parquet timestamps matches a DuckDB oracle reading the same files
(SURVEY.md §7.4 trap 2). Pass ``timezone="America/New_York"`` to reproduce
the reference's production setting.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs chosen for scale-out behavior, not just local tests:
#  - AQE handles runtime coalescing / skew-join splitting at 100 TB.
#  - shuffle.partitions is a default; AQE coalesces small ones.
#  - Arrow execution accelerates any pandas interop (vector ops, tests).
_BASE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # exact ANSI interval/overflow behavior is not needed; keep permissive
    # semantics so null-on-malformed casts match the reference's
    # strict=False Polars casts (SURVEY.md §7.4 trap 8).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "fresco-hpc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    timezone: str = "UTC",
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for tests; on a real cluster pass ``None`` with a spark-submit-provided
    master and these confs still apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(_BASE_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    confs["spark.sql.session.timeZone"] = timezone
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_shuffle_partitions(
    spark: SparkSession,
    input_bytes: int,
    shuffle_ratio: float = 1.0,
    target_partition_bytes: int = 128 << 20,
    min_per_core: int = 2,
    max_partitions: int = 200_000,
) -> int:
    """Size ``spark.sql.shuffle.partitions`` from the job's estimated
    shuffle volume (VERDICT r6 item 5 — the sf10 stress spilled 60 GB on
    containment_prefix at 500k docs because the local default of 32
    partitions is a fixed constant regardless of data volume).

    ``partitions = clamp(ceil(input_bytes · shuffle_ratio /
    target_partition_bytes), min_per_core · cores, max_partitions)``:

    - ``shuffle_ratio`` is the operator's measured shuffle-to-input
      amplification (1.0 for a plain agg; shingle exploders like the
      ngram pair generators shuffle ~5–10× their input — pass what the
      bench/SCALE.md measured for the operator family).
    - ``target_partition_bytes`` defaults to 128 MB — post-shuffle
      partitions that comfortably fit an executor task's memory budget
      with room for sort/aggregate overhead. AQE still coalesces DOWN
      when the estimate overshoots (adaptive.coalescePartitions is on
      in :data:`_BASE_CONFS`), so the cost of overestimating is small;
      underestimating is what spills.
    - the ``min_per_core · cores`` floor keeps every core busy on
      small inputs; ``max_partitions`` caps scheduler/shuffle-server
      overhead on absurd estimates.

    Sets the conf on the session and returns the chosen value. Call it
    per-job before building the plan (the conf is read at shuffle
    planning time); the stress tools re-tune per replication multiple.
    """
    import math

    cores = spark.sparkContext.defaultParallelism
    est = max(0, int(input_bytes * shuffle_ratio))
    n = max(
        min_per_core * cores,
        math.ceil(est / max(1, target_partition_bytes)),
    )
    n = min(n, max_partitions)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n


def widen_exchange(df, *key_cols):
    """Hash-repartition ``df`` by ``key_cols`` with an EXPLICIT partition
    count — ``max(defaultParallelism, spark.sql.shuffle.partitions)`` —
    so AQE's partition coalescing cannot shrink the exchange below the
    core count (r14, guide §2.6).

    Why: AQE coalesces post-shuffle partitions toward a BYTE target
    (``advisoryPartitionSizeInBytes`` / ``minPartitionSize``), which is
    the right economics for I/O-bound stages but serializes CPU-bound
    per-row work over small-in-bytes data — a keyed window over a few
    MB coalesces to 2–5 tasks on a 32-core host (isolated min-of-3 at
    sf0.1: interpolate_values 1.63 s → 0.84, rolling_zscore
    1.37 → 1.01). Use it for JVM-side consumers ONLY: a ``mapInPandas``
    consumer pays an Arrow-worker round trip per task, and pinning its
    exchange at core count measured SLOWER than the coalesced form
    (ewma_scan 1.19 → 1.51 at 32 tasks) — leave scans on the
    byte-target default, which is itself scale-adaptive.

    Scale behavior: the consumer (window / scan keyed the same way)
    REUSES this exchange, so no shuffle is added at any scale; the only
    change is pinning its width. At 100 TB the configured
    ``shuffle.partitions`` (sized by :func:`tune_shuffle_partitions` or
    the cluster conf) dominates the ``max``, so the pinned width equals
    what the planner would have used before coalescing — i.e. this is
    the identity decision at scale, exactly like ``_fan_out`` for scans.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions", str(cores)))
    except (ValueError, TypeError):
        # non-integer conf (e.g. 'auto' under an external AQE manager):
        # fall back to core count, but say so — a silent fallback loses
        # the configured width with no signal (ADVICE r14)
        import logging

        logging.getLogger(__name__).debug(
            "widen_exchange: spark.sql.shuffle.partitions is not an "
            "integer; falling back to defaultParallelism=%d",
            cores,
        )
        conf_parts = cores
    n = max(cores, conf_parts)
    return df.repartition(
        n, *[F.col(c) if isinstance(c, str) else c for c in key_cols]
    )


def input_bytes_of(paths: str | list[str]) -> int:
    """Total on-disk bytes under the given local file/dir paths — the
    cheap local-FS estimator :func:`tune_shuffle_partitions` pairs with
    (on a cluster, use the catalog's table statistics or the
    FileSystem's content summary instead)."""
    import os

    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
    return total


# --- catalog probes (SURVEY.md §2.8 "catalog") ------------------------------
# The reference probes sqlite_master / information_schema.tables and
# PRAGMA table_info before composing views (web/src/util/client.ts:58-61;
# web/src/pages/data_analysis.tsx:282-301; databaseOptimization.ts:110-112).


def table_exists(spark: SparkSession, name: str) -> bool:
    """``information_schema.tables`` existence probe → catalog lookup."""
    return spark.catalog.tableExists(name)


def list_tables(spark: SparkSession) -> list[str]:
    """``SHOW TABLES`` equivalent over the current catalog/temp views."""
    return sorted(t.name for t in spark.catalog.listTables())


def table_info(spark: SparkSession, name: str) -> list[tuple[str, str]]:
    """``PRAGMA table_info`` equivalent: (column, type) pairs in order."""
    return [(f.name, f.dataType.simpleString()) for f in spark.table(name).schema]


def analyze_table(spark: SparkSession, name: str) -> None:
    """``ANALYZE {table}`` (databaseOptimization.ts:102-123): compute
    statistics that feed Spark's CBO/AQE. Temp views can't hold catalog
    stats; persistent tables get full column stats."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
