"""Per-stage wall-clock attribution for the bench pipeline at a given
parallelism — the instrument VERDICT r2 #1 asked for.

Usage: python tools/profile_pipeline.py <cores> [n_conv]
Prints one JSON line: {"cores": N, "n_conv": C, "total": s, "stages": {...}}

Profile mode forces each persisted stage with a count() barrier as soon as
it is declared, so stage walls are attributable; the sum of stages slightly
exceeds the un-barriered timed run (extra barriers), which is fine — the
quantity of interest is the local[4]-vs-local[16] ratio PER STAGE.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_conv = int(sys.argv[2]) if len(sys.argv) > 2 else 1296000
    corpus = f"/tmp/kg_bench/transcripts_{n_conv}"

    from stixtoneodb_spark.session import get_spark, parallel_gc_threads

    # Mirror bench._session: pre-sized pre-touched heap, same GC policy —
    # profile attribution must reflect the TIMED protocol's JVM regime.
    mem = os.environ.get("SPARK_DRIVER_MEM", "56g")
    os.environ.setdefault(
        "SPARK_DRIVER_JAVA_OPTS",
        f"-XX:+UseParallelGC -XX:ParallelGCThreads={parallel_gc_threads(cores)} "
        f"-Xms{mem} -XX:+AlwaysPreTouch",
    )
    spark = get_spark(
        app_name=f"kg-profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from stixtoneodb_spark.plans.pipeline import run_volatile
    from stixtoneodb_spark.sources.transcripts import alias_edges_df

    aliases = alias_edges_df(spark)
    tr = spark.read.parquet(corpus)
    tr.count()

    # bench-protocol warm-up: 20% sample of the real corpus
    warm_frac = float(os.environ.get("SPARK_GRAFT_BENCH_WARM_FRAC", "0.2"))
    run_volatile(spark, tr.sample(warm_frac, seed=1), alias_edges=aliases)
    spark.catalog.clearCache()

    from stixtoneodb_spark.plans import canonicalize

    walls: dict[str, float] = {}
    canonicalize.PROFILE = walls  # sub-attribution inside the CC stage
    t0 = time.time()
    stats = run_volatile(spark, tr, alias_edges=aliases, stage_walls=walls)
    total = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_conv": n_conv,
                "n_turns": stats["n_turns"],
                "total": total,
                "stages": walls,
            }
        )
    )


if __name__ == "__main__":
    main()
