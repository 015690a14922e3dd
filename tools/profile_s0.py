"""Isolate the s0 anomaly: time scan / normalize / repartition / persist
sub-steps at a given core count.  Usage: python tools/profile_s0.py <cores>"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    corpus = "/tmp/kg_bench/transcripts_1296000"

    from stixtoneodb_spark.session import get_spark

    spark = get_spark(
        app_name=f"s0-prof-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stixtoneodb_spark.plans import assemble

    tr = spark.read.parquet(corpus)
    tr.count()  # page-cache touch

    out = {}

    def t(name, fn):
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 2)

    t("scan_count", lambda: tr.count())
    t("normalize_count", lambda: assemble.normalize_turns(tr).count())
    t(
        "normalize_repart_count",
        lambda: assemble.normalize_turns(tr).repartition("conv_id").count(),
    )
    cached = assemble.normalize_turns(tr).repartition("conv_id").persist()
    t("persist_count", lambda: cached.count())
    t("recount_cached", lambda: cached.count())
    cached.unpersist()
    print(json.dumps({"cores": cores, **out}))


if __name__ == "__main__":
    main()
