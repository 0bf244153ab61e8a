"""Hour-partitioned parquet store (SURVEY.md §1.1, §2.11 Q5).

The reference keeps one parquet chunk per hour under
``chunks/YYYY/MM/DD/HH.parquet`` plus a JSON manifest with per-chunk
``timeRange``/``recordCount``/``sizeBytes`` (reference
backend/lambda/lambda_handler.py:236-245, 80-95, 313-373). The Spark-first
restatement is a Hive-partitioned layout ``year=/month=/day=/hour=``: the
manifest is subsumed by partition discovery plus parquet footer statistics,
and Catalyst prunes partitions from the ``time BETWEEN`` predicate
automatically — no custom FileIndex needed (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ["year", "month", "day", "hour"]


def write_partitioned_store(
    df: DataFrame,
    path: str,
    time_col: str = "time",
    mode: str = "overwrite",
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` hour-partitioned by ``time_col``.

    Derived partition columns are regular Hive partition keys, so any
    engine (Spark, DuckDB, Trino) can prune them; at 100 TB this gives
    ~1 directory per hour exactly like the reference's chunk scheme, but
    each hour may hold many files written in parallel by many tasks.

    ``sort_cols`` clusters rows inside each task's files on secondary
    dimensions (host, job id, …): parquet row-group min/max stats then
    become selective for predicates on those columns, so scans skip row
    groups the partition keys can't prune — the cheap single-dimension
    cousin of Z-ordering, free at write time.
    """
    out = (
        df.withColumn("year", F.year(time_col))
        .withColumn("month", F.month(time_col))
        .withColumn("day", F.dayofmonth(time_col))
        .withColumn("hour", F.hour(time_col))
    )
    if sort_cols:
        out = out.sortWithinPartitions(*PARTITION_COLS, *sort_cols)
    (
        out.write.mode(mode)
        .partitionBy(*PARTITION_COLS)
        .option("compression", "snappy")
        .parquet(path)
    )


def read_partitioned_store(spark: SparkSession, path: str) -> DataFrame:
    """Open the store with partition discovery; the partition key columns
    come back typed (int) and prunable. Drop them with ``.drop(*PARTITION_
    COLS)`` if the caller wants the original shape."""
    return spark.read.option("basePath", path).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: rows are hash-partitioned into
    ``n_buckets`` files on ``bucket_col`` at WRITE time, each bucket sorted
    on the key.

    This is the co-located-join primitive for 100 TB: two tables bucketed
    the same way join with ZERO exchange and zero sort — the dominant cost
    of a repeated big⋈big join paid once at ingest instead of per query.
    (Plain parquet paths can't carry bucket metadata; this must be a
    catalog table, which is why it lives here next to the store.)
    `test_bucketed_join_has_no_exchange` pins the no-shuffle plan.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("compression", "snappy")
        .format("parquet")
        .saveAsTable(table_name)
    )


def list_partition_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(file, size) listing via the Hadoop FileSystem API — works on
    hdfs:// and s3a:// the same as file://, unlike os.walk. Used only by
    the planner facade for plan metadata, never on the query path."""
    sc = spark.sparkContext
    hadoop_conf = sc._jsc.hadoopConfiguration()
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hadoop_conf)
    out: list[tuple[str, int]] = []
    if not fs.exists(jpath):
        return out
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        status = it.next()
        p = status.getPath().toString()
        if p.endswith(".parquet"):
            out.append((p, int(status.getLen())))
    return out


def compact_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    _wrap_fs=None,
) -> list[str]:
    """Small-file compaction for the hour-partitioned store: rewrite any
    hour partition whose parquet files are numerous and under-sized into
    ~``target_file_bytes`` files. Streaming ingest (one file per
    micro-batch per task) fragments partitions; thousands of tiny files
    cost a scan task each and overwhelm file listing at 100 TB — the
    fix every production lake runs on a schedule.

    Per-partition and idempotent: each selected hour is read, coalesced
    to ``ceil(bytes/target)`` files, written to a staging dir, then
    swapped in with a data-preserving two-rename protocol: the live dir
    is renamed to ``._compact_bak`` first, the staging dir renamed into
    place, and only then is the backup deleted (each rename is atomic
    per directory on HDFS-like stores; the pair is not, but a crash at
    any point leaves the rows recoverable in exactly one of live /
    staging / backup — never lost). On entry, orphaned ``._compact_tmp``
    / ``._compact_bak`` dirs from a previous crash are rolled back or
    removed, so a crashed run heals on the next invocation. Readers must
    not scan the store concurrently with compaction (they could observe
    a partition mid-swap) — same contract as any file-level rewrite
    without a table format's snapshot isolation; use Delta/Iceberg
    commit protocols when concurrent readers are required.
    Untouched partitions keep their files byte-identical. Returns the
    rewritten partition paths.
    """
    import math
    from collections import defaultdict

    STAGING_SUFFIX = "._compact_tmp"
    BACKUP_SUFFIX = "._compact_bak"

    sc = spark.sparkContext
    fs_conf = sc._jsc.hadoopConfiguration()

    def _jp(p: str):
        return sc._jvm.org.apache.hadoop.fs.Path(p)

    # --- crash recovery: heal any partition left mid-swap by a prior run.
    # Walk the tree once via the FileSystem API (globs can't express
    # "any depth", and the store may live on hdfs:// / s3a://).
    root = _jp(path)
    fs = root.getFileSystem(fs_conf)
    if _wrap_fs is not None:
        # test seam: Hadoop FileSystems signal most failures by RETURNING
        # FALSE, and only a wrapper can force that branch deterministically
        # (test_planner pins that a false rename aborts before any delete)
        fs = _wrap_fs(fs)
    if not fs.exists(root):
        return []
    leftovers: list[str] = []
    stack = [root]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.endswith(STAGING_SUFFIX) or name.endswith(BACKUP_SUFFIX):
                leftovers.append(st.getPath().toString())
            else:
                stack.append(st.getPath())
    def _must(ok: bool, what: str) -> None:
        # Hadoop FileSystem signals most failures by RETURNING FALSE, not
        # raising. Treating a false return as success here can destroy
        # the only remaining copy of a partition's rows (ADVICE r03), so
        # every rename/delete on the swap path is checked and a failure
        # aborts with backup + staging left intact for recovery.
        if not ok:
            raise IOError(
                f"compact_store: {what} returned false; aborting — rows "
                "remain in the live/backup/staging dirs and the next run "
                "will recover them"
            )

    # Backups first: rolling a backup back restores the live dir that the
    # staging-cleanup branch below checks for.
    for stray in sorted(leftovers, key=lambda s: not s.endswith(BACKUP_SUFFIX)):
        if stray.endswith(BACKUP_SUFFIX):
            live = stray[: -len(BACKUP_SUFFIX)]
            if fs.exists(_jp(live)):
                # live dir present: the swap completed (or never started);
                # the backup is redundant.
                _must(fs.delete(_jp(stray), True), f"recovery delete {stray}")
            else:
                # crashed between rename(live→bak) and rename(tmp→live):
                # roll back so no data is lost.
                _must(fs.rename(_jp(stray), _jp(live)), f"recovery rename {stray} -> {live}")
        else:
            # staging: discard ONLY when the live dir holds the rows — if a
            # failed swap left the rows in backup/staging alone, deleting
            # staging here could drop the only copy (ADVICE r03).
            live = stray[: -len(STAGING_SUFFIX)]
            if fs.exists(_jp(live)):
                _must(fs.delete(_jp(stray), True), f"recovery delete {stray}")

    per_part: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for f, size in list_partition_files(spark, path):
        part_dir = f.rsplit("/", 1)[0]
        per_part[part_dir].append((f, size))
    rewritten: list[str] = []
    for part_dir, files in sorted(per_part.items()):
        total = sum(s for _, s in files)
        n_target = max(1, math.ceil(total / target_file_bytes))
        if len(files) < min_files_to_compact or len(files) <= n_target:
            continue
        staging = part_dir + STAGING_SUFFIX
        backup = part_dir + BACKUP_SUFFIX
        (
            spark.read.parquet(part_dir)
            .coalesce(n_target)
            .write.mode("overwrite")
            .option("compression", "snappy")
            .parquet(staging)
        )
        # drop the _SUCCESS marker so the swapped-in dir holds data only
        succ = _jp(staging + "/_SUCCESS")
        if fs.exists(succ):
            _must(fs.delete(succ, False), f"delete {staging}/_SUCCESS")
        # two-rename swap: rows always live in ≥1 of live/staging/backup;
        # every step checked — a false return aborts with both safety
        # copies intact (recovery above heals on the next invocation)
        _must(fs.rename(_jp(part_dir), _jp(backup)), f"rename {part_dir} -> {backup}")
        _must(fs.rename(_jp(staging), _jp(part_dir)), f"rename {staging} -> {part_dir}")
        _must(fs.delete(_jp(backup), True), f"delete {backup}")
        rewritten.append(part_dir)
    return rewritten
