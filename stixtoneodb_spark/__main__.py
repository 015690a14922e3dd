"""spark-submit entry point for the KG construction pipeline.

Reference correspondence: StixToNeoDB's CLI (A1,
/root/reference/StixToNeoDB.scala:32-58) selects a mode (-f bundle /
-x line stream), an input, and a db dir, defaulting the store location.
This is the distributed equivalent (north_rule: runs launch via
``spark-submit --py-files``):

    spark-submit --py-files stixtoneodb_spark.zip -m stixtoneodb_spark \\
        --input /data/transcripts --warehouse /data/kg --run-id run-42

In local dev (no spark-submit) it self-hosts a session:

    python -m stixtoneodb_spark --input ... --warehouse ...

Modes mirror the reference's:
  batch  (default)  — the -f analog: full-corpus KgPipeline run with
                      per-stage checkpoints; re-running the same run-id
                      resumes from the last completed stage.
  stream            — the -x analog: Structured Streaming ingest of
                      transcript chunk files into the mention MERGE sink.
  query             — run any registry operator by name over a table dir
                      (--input), writing parquet to --warehouse (or
                      printing row count): the ad-hoc analytics surface,
                      so every queries() operator is reachable from the
                      CLI, not just from Python.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="stixtoneodb_spark")
    p.add_argument("--input", required=True, help="transcripts parquet path or table")
    p.add_argument("--warehouse", required=True, help="output warehouse dir / catalog")
    p.add_argument("--run-id", default="run-0", help="resume key for checkpointed stages")
    p.add_argument(
        "--mode",
        choices=["batch", "stream", "query"],
        default="batch",
        help="-f / -x analog, or ad-hoc operator query",
    )
    p.add_argument("--master", default=None, help="override master (dev only; spark-submit sets it)")
    p.add_argument("--export-graphml", default=None, metavar="PATH", help="also export GraphML document")
    p.add_argument("--export-cypher", default=None, metavar="PATH", help="also export Cypher statements")
    p.add_argument("--query", default=None, help="registry operator name (mode=query)")
    args = p.parse_args(argv)

    from stixtoneodb_spark.session import get_spark

    spark = get_spark(app_name=f"kg-{args.run_id}", master=args.master)

    if args.mode == "query":
        from stixtoneodb_spark.operators.registry import REGISTRY

        if args.query not in REGISTRY:
            known = ", ".join(sorted(REGISTRY))
            print(f"unknown query {args.query!r}; known: {known}", file=sys.stderr)
            return 2
        fn, _sql = REGISTRY[args.query]
        df = fn(spark, args.input)
        out = f"{args.warehouse.rstrip('/')}/{args.query}"
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(json.dumps({"mode": "query", "query": args.query, "rows": n, "out": out}))
        return 0

    if args.mode == "stream":
        from stixtoneodb_spark.streaming import ingest

        stream = ingest.read_transcript_stream(spark, args.input)
        q = ingest.start_mention_merge_sink(
            stream, args.warehouse, f"{args.warehouse}/_stream_checkpoint"
        )
        q.awaitTermination()
        print(json.dumps({"mode": "stream", "status": "drained"}))
        return 0

    from stixtoneodb_spark.plans.pipeline import KgPipeline
    from stixtoneodb_spark.sources.transcripts import alias_edges_df

    transcripts = spark.read.parquet(args.input)
    result = KgPipeline(spark, args.warehouse, run_id=args.run_id).run(
        transcripts, alias_edges=alias_edges_df(spark)
    )
    if args.export_graphml:
        from stixtoneodb_spark.operators.export import export_graphml

        export_graphml(result.nodes, result.edges, args.export_graphml)
    if args.export_cypher:
        from stixtoneodb_spark.operators.export import export_cypher

        export_cypher(result.nodes, result.edges, args.export_cypher)
    print(json.dumps({"mode": "batch", "run_id": args.run_id, "metrics": result.metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
