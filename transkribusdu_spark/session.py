"""SparkSession construction with scale-oriented defaults.

The same settings we would ship to a 1000-executor cluster, minus the
cluster manager specifics: AQE on (skew-join splitting + shuffle
coalescing), Arrow enabled for all pandas UDF exchange, bounded Arrow
batch sizes so a giant document batch cannot OOM an executor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: on a real cluster this is sized to ~2-3x total cores
# and AQE coalesces down. local[32] tests use 32.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def build_session(
    app_name: str = "transkribusdu_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # AQE: runtime re-planning — shuffle coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: the only sanctioned Python<->JVM data path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound per-batch memory for mapInPandas/applyInPandas over
        # documents with large html payloads.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # Broadcast joins for small dims (fitted params, host tables).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Scan split sizing for a PYTHON-PARSE-BOUND engine: the hot
        # stages spend ~100x more CPU per byte than a columnar scan
        # (html -> Arrow -> ElementTree parse), so a 128 MB split is a
        # multi-minute task and the default 4 MB per-file open cost
        # packs small files into FEW, RAGGED splits (measured: a 1.5 GB
        # / 192-file corpus became 18 splits — one full wave of 16
        # threads plus a 2-task tail that doubled the stage wall). 32 MB
        # splits + 1 MB open cost keep every core in work at small
        # corpus sizes; at 100 TB both settings are irrelevant to wave
        # shape (hundreds of splits per executor either way) and 32 MB
        # still means ~30 s parse tasks — well above scheduling noise.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024)),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    return spark or build_session()
