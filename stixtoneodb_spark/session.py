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
import re

from pyspark.sql import SparkSession


def parallel_gc_threads(cores: int) -> int:
    """ParallelGC worker count for an executor JVM with ``cores`` CPUs —
    the JVM's own container ergonomics formula (n for n<=8, else
    8 + 5/8·(n−8)).  A real N-core executor node sizes its GC this way;
    pinning a FLAT thread count across local[N] levels instead (round 2/3
    used 8 for both) under-provisions the larger level relative to a real
    cluster: ParallelGC is stop-the-world, so its workers never compete
    with paused executor threads, and 8 threads collecting a 56g young gen
    against 16 allocating cores was measured as the single largest
    non-scaling cost at local[16] (27.9M turns: wall 109.8s at 8 GC
    threads vs 81.4s at 16 — the collector, not the engine, was the
    residue)."""
    return cores if cores <= 8 else 8 + (cores - 8) * 5 // 8


def _master_cores(master: str) -> int:
    """Executor-core count implied by a local[N] master (the emulated
    node width); local[*] and non-local masters fall back to the host
    count — on a real cluster executors are separate JVMs whose GC the
    cluster manager sizes, so the value only matters in local mode."""
    m = re.match(r"local\[(\d+)\]", master)
    if m:
        return int(m.group(1))
    return os.cpu_count() or 8


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
        # parallelismFirst stays at its default (true) GLOBALLY: the
        # Arrow/pandas stages (S2) want few, core-count-sized partitions —
        # size-based coalescing fragmented them into hundreds of small
        # tasks whose per-task Arrow overhead halved local[16] throughput.
        # The tiny-frame stages that DO suffer core-count partitioning
        # (candidate blocking, the CC loop) scope
        # parallelismFirst=false + shuffle.partitions=1 locally in
        # plans/canonicalize.py instead — their materialization happens
        # under the CC loop's conf scope, so the setting reaches them.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Scan splits: the 128MB default bin-packs a multi-file table into
        # ~core-count splits locally (maxSplitBytes = min(128MB,
        # totalSize/parallelism)), which leaves the scan ONE ragged wave —
        # measured 1.5-1.7x scan scaling from 4→16 cores purely from
        # stragglers (round-3 verdict: the s0_normalize residue).  32MB
        # gives 4-5 waves of evenly-sized tasks (2.17s vs 3.8s at
        # local[16], 27.9M turns) and bounds per-task decode memory; at
        # 100 TB it means ~3M scan tasks over 1000 executors — ~200 task
        # waves, far above the scheduler floor, and AQE coalescing keeps
        # downstream shuffles at their own sizing.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # Arrow transfer for every pandas UDF / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        # Deterministic session timezone: timestamps in oracles must agree.
        .config("spark.sql.session.timeZone", "UTC")
        # Keep broadcast autodetect on; dims in this pipeline are small.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The 300s default broadcast deadline is a LATENCY guard, not a
        # correctness one: on a co-tenant-stolen shared box (or a real
        # cluster with stragglers feeding the broadcast's build side) the
        # build can legitimately exceed it — measured here: a bench
        # pipeline run at local[4] that normally finishes in ~280s total
        # hit the 300s broadcast deadline during a steal window and
        # failed, where waiting would have succeeded.  A batch engine
        # prefers the wait; 1200s still catches true deadlocks.
        .config(
            "spark.sql.broadcastTimeout",
            os.environ.get("SPARK_GRAFT_BROADCAST_TIMEOUT", "1200"),
        )
        # Local mode runs executors inside the driver JVM: the heap must
        # hold the persisted stage outputs AND every concurrent task's
        # working set, or GC becomes a shared bottleneck that caps scaling
        # (more cores → more concurrent allocation → more GC of the same
        # heap).  On a real cluster this is per-executor memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "56g"))
        # Throughput collector: G1's concurrent cycles compete with the 16+
        # executor threads for cores and its region management fragments
        # under heavy task allocation; ParallelGC measured ~2x faster on
        # the allocation-heavy join/materialize stages (S4 38s -> 16s,
        # S5 80s -> 60s at local[16], 18.6M turns) with zero change at
        # low parallelism.  Batch engine, no latency SLO -> pause-time
        # collector buys nothing here.  GC threads follow the JVM's own
        # CONTAINER ergonomics for the emulated executor width
        # (parallel_gc_threads above): local[N] gets the thread count a
        # real N-core executor node's JVM would pick.  (Rounds 2-3 capped
        # both levels at a flat 8 on a competes-with-executors theory that
        # holds for concurrent collectors, not for stop-the-world
        # ParallelGC — measured at local[16] the flat cap was the single
        # largest non-scaling cost; see parallel_gc_threads.)
        # Long-lived workloads (and the bench, bench.py) additionally set
        # -Xms=-Xmx + AlwaysPreTouch via $SPARK_DRIVER_JAVA_OPTS: a GROWING
        # heap is the dominant first-run cost (ParallelGC collects+resizes
        # while committed heap climbs toward -Xmx — measured @16 cores,
        # 27.9M turns: 177s growing vs 91s pre-sized).  Not the library
        # default: short-lived test sessions would commit 56g each, and two
        # coexisting JVMs (e.g. the spark-submit e2e test under pytest)
        # would pre-touch past the box's RAM.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                "-XX:+UseParallelGC "
                f"-XX:ParallelGCThreads={parallel_gc_threads(_master_cores(master))}",
            ),
        )
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
