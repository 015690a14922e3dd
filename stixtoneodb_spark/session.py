"""SparkSession factory with scale-oriented defaults.

The reference is a single-JVM, single-thread loader (StixToNeoDB.scala:32-58);
its only scale concession is line-at-a-time reading (README.md:78-82).  Our
replacement pushes everything through Catalyst/Tungsten, so the session
defaults matter: AQE on (runtime re-plan + skew-join splitting), Arrow on
(vectorized pandas-UDF transfer), shuffle partitions sized to the target
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir() -> str:
    """Scratch dir for shuffle/spill: tmpfs if present, else /tmp."""
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return "/tmp"


def get_spark(
    app_name: str = "stixtoneodb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the KG pipeline.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) in
    the sandbox; on a real cluster callers pass ``None`` and let
    ``spark-submit`` supply the master.  ``shuffle_partitions`` defaults to
    the core count locally; on a 1000-executor cluster set it to ~2-3x total
    cores (or rely on AQE coalescing, which is enabled here).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # broadcast conversion after runtime stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalesce post-shuffle partitions by SIZE, not defaultParallelism:
        # with parallelismFirst (the default) every tiny intermediate stage
        # still gets core-count partitions, so stage latency GROWS with
        # cores — measured as anti-scaling on the small S3/S4 frames
        # (candidate pairs, CC graph).  Size-based coalescing gives tiny
        # stages one task while big scans stay fully partitioned; this is
        # also the setting Spark's own docs recommend for real clusters.
        # 8m advisory: tiny stages (KBs) still collapse to one task, while
        # medium stages (tens of MB) keep enough partitions to fill a
        # low-core executor — 32m was measured to under-parallelize
        # local[4] on the mid-size S3/S4 frames.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic session timezone: timestamps in oracles must agree.
        .config("spark.sql.session.timeZone", "UTC")
        # Keep broadcast autodetect on; dims in this pipeline are small.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Local mode runs executors inside the driver JVM: the heap must
        # hold the persisted stage outputs AND every concurrent task's
        # working set, or GC becomes a shared bottleneck that caps scaling
        # (more cores → more concurrent allocation → more GC of the same
        # heap).  On a real cluster this is per-executor memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "56g"))
        # Shuffle/spill files on tmpfs when available: a cluster gives every
        # executor node its own local NVMe, so per-node shuffle bandwidth
        # scales with the cluster; a single box's root disk does not — it
        # imposes a core-count-independent I/O floor that distorts local
        # scaling measurements.  tmpfs is the sandbox stand-in.
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
