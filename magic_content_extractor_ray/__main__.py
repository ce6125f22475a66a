"""CLI: run the distributed extraction pipeline over a docs table.

    python -m magic_content_extractor_ray \
        --input /path/to/docs_parquet_or_dir \
        --output /tmp/extracted \
        [--checkpoint --partitions 16] [--formats text,markdown] \
        [--num-cpus 32] [--strategy readability]

Input: parquet (or .lance when available) with columns
(doc_id, spans, [url]). Owns its Ray session (the library never calls
ray.init).
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser(prog="magic_content_extractor_ray")
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", default="docs",
                    choices=["docs", "warc", "jsonl"],
                    help="docs = parquet/lance spans table; warc = web "
                         "archive shards; jsonl = lines of (doc_id,url,html)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--output-format", default="parquet",
                    choices=["parquet", "jsonl"])
    ap.add_argument("--checkpoint", action="store_true",
                    help="resumable partitioned run with lineage manifest")
    ap.add_argument("--incremental", action="store_true",
                    help="per-FILE resumable ingest: process parquet files "
                         "not yet in the output manifest (docs input only)")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--formats", default="",
                    help="comma list: text,markdown")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--strategy", default=None,
                    help="force a strategy (article/forum/weixin/"
                         "readability/pdf); default: auto-dispatch")
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .sources.io import read_docs
    from .pipelines.extract_pipeline import run_extract_pipeline
    from .state.checkpoint import run_checkpointed

    def load():
        if args.input_format == "warc":
            from .sources.warc import read_warc

            return read_warc(args.input)
        if args.input_format == "jsonl":
            import ray.data as rd
            from .sources.html_table import html_docs_to_spans

            return html_docs_to_spans(rd.read_json(args.input))
        return read_docs(args.input)

    formats = tuple(f for f in args.formats.split(",") if f)
    kwargs = dict(batch_size=args.batch_size, formats=formats,
                  strategy_override=args.strategy)

    if args.incremental:
        from .state.checkpoint import run_incremental

        recs = run_incremental(args.input, args.output,
                               pipeline_kwargs=kwargs)
        print(json.dumps({"files_completed": len(recs), "lineage": recs}))
        ray.shutdown()
        return 0
    if args.checkpoint:
        # parquet docs input: fragment-partitioned resume (each byte read
        # once per run); other sources use the legacy filter path
        source = load
        if args.input_format == "docs" and args.input.endswith(".parquet"):
            from .state.checkpoint import make_fragment_table_factory

            source = make_fragment_table_factory(args.input)
        recs = run_checkpointed(
            source, args.output,
            num_partitions=args.partitions, pipeline_kwargs=kwargs)
        print(json.dumps({"partitions_completed": len(recs),
                          "lineage": recs}))
    else:
        out = run_extract_pipeline(load(), **kwargs)
        if args.output_format == "jsonl":
            out.write_json(args.output)
        else:
            out.write_parquet(args.output)
        print(json.dumps({"output": args.output}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
