"""SparkSession factory and runtime configuration.

The engine targets a large multi-executor cluster (the design assumes ~100 TB
inputs); locally it runs on ``local[$SPARK_GRAFT_CPUS]``. Only
*runtime-settable* SQL confs are applied in :func:`prepare` so that it is safe
to call on an externally-created session (the correctness driver owns its own
``SparkSession``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to any session the engine uses. Rationale:
#: - AQE: runtime re-planning (partition coalescing, skew-join splitting) is
#:   the main defense against skew at the 100 TB target.
#: - UTC session timezone: parquet test tables carry naive timestamps; pinning
#:   UTC makes Spark(LTZ) agree with DuckDB(naive) byte-for-byte.
#: - Arrow: all pandas_udf / mapInPandas paths use Arrow batches.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MiB scan splits: at 100 TB this yields ~800k tasks, the standard
    # granularity; locally it keeps small files in one task.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # The driver's events table stores TIMESTAMP(NANOS) which parquet-mr
    # cannot map to a Spark type; read as nanos-since-epoch longs and convert
    # explicitly (sources/tables.py) — same truncation DuckDB applies.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Python DataSource filter pushdown (the .ss reader prunes partitions
    # from pushed sequence/timestamp bounds via its beacon index).
    "spark.sql.python.filterPushdown.enabled": "true",
}


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    An externally-created session (e.g. the correctness driver's) may run
    from a cwd where ``sea_streamer_spark`` is not on the workers' path;
    any pickled-by-reference function would then fail to unpickle. Shipping
    a zip of the package via ``addPyFile`` once per session fixes that.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    try:
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_path = os.path.join(tempfile.gettempdir(), f"sea_streamer_spark_{os.getpid()}.zip")
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for fn in files:
                        if fn.endswith(".py"):
                            full = os.path.join(root, fn)
                            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                            zf.write(full, rel)
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added or restricted deployment — closures still work
    _SHIPPED.add(app_id)


def prepare(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # conf not settable at runtime in this deployment -> keep going
            pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "sea-streamer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession configured for this engine.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 4 for tests; the
    driver uses 32). Shuffle partitions default to 2x cores — AQE coalesces
    down when partitions are small, and at cluster scale the operator layer
    repartitions explicitly where it matters.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return prepare(builder.getOrCreate())
