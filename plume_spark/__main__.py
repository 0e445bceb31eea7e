"""CLI entry point — the Spark recast of the reference's CLI
(src/main/scala/com/github/plume/oss/Plume.scala:17-28: parse config, bind a
store backend, run the construction pipeline).

Run locally or on a cluster:

    spark-submit --py-files plume_spark.zip -m plume_spark build \
        --input /data/transcripts.parquet --store /data/kg-store
    python -m plume_spark build --generate 500 --store /tmp/kg-store
    python -m plume_spark query --store /tmp/kg-store --top-predicates
    python -m plume_spark export --store /tmp/kg-store --out /tmp/kg-json

Subcommands mirror the reference's surface: ``build`` (createAst + bulkTx),
``query`` (read benchmarks' ops), ``export`` (GraphML/JSON exporters),
``clear`` (S8 destructive clear).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _build(args) -> int:
    from plume_spark.pipeline import build_graph
    from plume_spark.session import get_spark
    from plume_spark.store.graph import GraphStore

    spark = get_spark(app_name="plume-build", master=args.master)
    if args.generate:
        from plume_spark.generator import generate_transcripts

        transcripts = generate_transcripts(spark, args.generate, seed=args.seed)
    else:
        transcripts = spark.read.parquet(args.input)
    store = GraphStore(spark, args.store)
    stats = build_graph(
        transcripts,
        store,
        n_buckets=args.buckets,
        tau=args.tau,
        max_units=args.max_units,
    )
    print(json.dumps(stats))
    return 0


def _query(args) -> int:
    from plume_spark.session import get_spark
    from plume_spark.store.graph import GraphStore

    spark = get_spark(app_name="plume-query", master=args.master)
    store = GraphStore(spark, args.store)
    if args.top_predicates:
        store.triples.read().groupBy("pred").count().orderBy(
            F.col("count").desc()
        ).show(50, truncate=False)
    elif args.entity:
        store.entities.read().filter(
            F.col("canonical_name") == args.entity
        ).show(truncate=False)
    else:
        print(
            json.dumps(
                {
                    "entities": store.entities.row_count(),
                    "triples": store.triples.row_count(),
                    "lineage_commits": len(store.lineage.snapshots()),
                }
            )
        )
    return 0


def _export(args) -> int:
    # Format coverage vs the reference (TinkerGraphDriver.scala:31-41):
    # GraphML + GraphSON + JSON round-trip here; Gryo is n/a BY DESIGN —
    # it is a JVM Kryo byte stream (Java object serialization) with no
    # sensible Python/Spark parity, and its SEMANTICS (lossless typed
    # node/edge round trip) are fully covered by the three text formats.
    from plume_spark.session import get_spark
    from plume_spark.store.graph import GraphStore

    spark = get_spark(app_name="plume-export", master=args.master)
    store = GraphStore(spark, args.store)
    if args.format == "graphml":
        store.export_graphml(args.out)
    elif args.format == "graphson":
        store.export_graphson(args.out)
    else:
        store.export_json(args.out)
    print(json.dumps({"exported_to": args.out, "format": args.format}))
    return 0


def _stream(args) -> int:
    """Continuous-arrival ingest (streaming/ingest.py): drain all files
    currently in --input into the store, exactly-once per file across
    invocations (checkpoint lives under the store root)."""
    import os

    from plume_spark.session import get_spark
    from plume_spark.store.graph import GraphStore
    from plume_spark.streaming import read_transcript_stream, stream_build

    spark = get_spark(app_name="plume-stream", master=args.master)
    store = GraphStore(spark, args.store)
    stream = read_transcript_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger
    )
    ckpt = args.checkpoint or os.path.join(args.store, "_stream_checkpoint")
    stats = stream_build(stream, store, ckpt, tau=args.tau)
    print(json.dumps(stats))
    return 0


def _dedup_stream(args) -> int:
    """Continuous near-dup detection (streaming/dedup.py): drain document
    files in --input against the persisted MinHash index at --index,
    exactly-once per file across invocations."""
    import os

    from plume_spark.session import get_spark
    from plume_spark.streaming import DedupIndex, read_document_stream, stream_dedup

    spark = get_spark(app_name="plume-dedup-stream", master=args.master)
    idx = DedupIndex(spark, args.index)
    stream = read_document_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger
    )
    ckpt = args.checkpoint or os.path.join(args.index, "_stream_checkpoint")
    stats = stream_dedup(stream, idx, ckpt, tau=args.tau)
    print(json.dumps(stats))
    return 0


def _maintain(args) -> int:
    """Table maintenance (Iceberg rewrite_data_files / expire_snapshots
    analogs): compact every store table to its layout-natural fileset and,
    with --expire, reclaim history older than the last N snapshots."""
    from plume_spark.session import get_spark
    from plume_spark.store.graph import GraphStore

    from plume_spark.pipeline import staging_table

    spark = get_spark(app_name="plume-maintain", master=args.master)
    store = GraphStore(spark, args.store)
    # typed handles carry each table's declared layout — compaction rewrites
    # into THAT layout (an untyped handle would flatten a bucketed table)
    names = store.catalog.tables()
    handles = {
        "entities": store.entities,
        "triples": store.triples,
        "lineage": store.lineage,
    }
    if "changelog" in names:
        handles["changelog"] = staging_table(store)
    report: dict[str, dict] = {}
    for name in names:
        t = handles.get(name) or store.catalog.table(name)
        r: dict = {"files_before": len(t.files_for())}
        r["compacted_snapshot"] = t.compact(target_file_rows=args.target_file_rows)
        if args.expire is not None:
            r["expired"] = t.expire_snapshots(keep_last=args.expire)
        r["files_after"] = len(t.files_for())
        report[name] = r
    print(json.dumps(report))
    return 0


def _clear(args) -> int:
    from plume_spark.session import get_spark
    from plume_spark.store.graph import GraphStore

    spark = get_spark(app_name="plume-clear", master=args.master)
    GraphStore(spark, args.store).clear()
    print(json.dumps({"cleared": args.store}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="plume_spark")
    p.add_argument("--master", default=None, help="Spark master (default: env/local)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="transcripts -> entities/triples store")
    b.add_argument("--input", help="transcript parquet path (conv_id, turn_idx, role, text, tool, ts)")
    b.add_argument("--generate", type=int, default=0, help="instead of --input: generate N synthetic conversations")
    b.add_argument("--seed", type=int, default=7)
    b.add_argument("--store", required=True, help="graph store root directory")
    b.add_argument("--buckets", type=int, default=64, help="conv_id hash-buckets (work/lineage units)")
    b.add_argument("--tau", type=float, default=None, help="LSH verify threshold override")
    b.add_argument("--max-units", type=int, default=None, help="process at most N pending buckets (chunked/incremental)")
    b.set_defaults(fn=_build)

    q = sub.add_parser("query", help="read ops over a built store")
    q.add_argument("--store", required=True)
    q.add_argument("--top-predicates", action="store_true")
    q.add_argument("--entity", help="point lookup by canonical name")
    q.set_defaults(fn=_query)

    e = sub.add_parser("export", help="export the graph (S6/S7)")
    e.add_argument("--store", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--format", choices=["json", "graphml", "graphson"], default="json")
    e.set_defaults(fn=_export)

    s = sub.add_parser("stream", help="streaming ingest: drain new transcript files into the store")
    s.add_argument("--input", required=True, help="directory watched for transcript parquet files")
    s.add_argument("--store", required=True)
    s.add_argument("--checkpoint", default=None, help="stream checkpoint dir (default: <store>/_stream_checkpoint)")
    s.add_argument("--tau", type=float, default=None)
    s.add_argument("--max-files-per-trigger", type=int, default=None)
    s.set_defaults(fn=_stream)

    ds = sub.add_parser("dedup-stream", help="continuous near-dup detection over arriving document files")
    ds.add_argument("--input", required=True, help="directory watched for document parquet files")
    ds.add_argument("--index", required=True, help="dedup index directory (sigs/toks/pairs snapshot tables)")
    ds.add_argument("--checkpoint", default=None, help="stream checkpoint dir (default: <index>/_stream_checkpoint)")
    ds.add_argument("--tau", type=float, default=0.5)
    ds.add_argument("--max-files-per-trigger", type=int, default=None)
    ds.set_defaults(fn=_dedup_stream)

    m = sub.add_parser("maintain", help="compact tables; optionally expire old snapshots")
    m.add_argument("--store", required=True)
    m.add_argument("--target-file-rows", type=int, default=4_000_000)
    m.add_argument("--expire", type=int, default=None, help="keep only the last N snapshots per table")
    m.set_defaults(fn=_maintain)

    c = sub.add_parser("clear", help="destructive clear (S8)")
    c.add_argument("--store", required=True)
    c.set_defaults(fn=_clear)

    args = p.parse_args(argv)
    if args.cmd == "build" and not (args.input or args.generate):
        p.error("build requires --input or --generate")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
