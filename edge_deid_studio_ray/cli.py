"""Command-line driver — the ``main.py`` analogue (S13) for the Ray engine.

Usage (also the ``ray job submit`` entry point)::

    python -m edge_deid_studio_ray.cli \
        --input /path/to/pages_parquet_dir --output /tmp/deid_out \
        --mode replace --lang-col lang --num-cpus 32 [--shards 8] [--resume]

Reads a pages-schema parquet directory (url, warc_ts, html, text, lang),
runs the extraction+deid pipeline, writes partitioned parquet + per-shard
lineage manifests, prints the JSON run report (reference report shape,
scripts/run_multi_dataset_pipeline.py:805-830).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="edge-deid-ray", description=__doc__)
    parser.add_argument("-i", "--input", required=True, help="pages parquet file/dir")
    parser.add_argument("-o", "--output", required=True, help="output directory")
    parser.add_argument(
        "-m", "--mode", default="replace", choices=["replace", "blackbox", "black", "redact", "mask"]
    )
    parser.add_argument("--extract-mode", default="full", choices=["full", "main_content"])
    parser.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    parser.add_argument("--shards", type=int, default=1, help="resumable shard count")
    parser.add_argument(
        "--max-in-flight",
        type=int,
        default=1,
        help="bounded window of concurrently executing shards (driver threads)",
    )
    parser.add_argument("--partitions", type=int, default=64, help="url-hash partition count")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--no-resume", action="store_true", help="clear committed manifests first")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    from .config import install_empty_schema_log_filter

    install_empty_schema_log_filter()
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from .config import EngineConfig
    from .pipelines.deid import run_deid_job

    cfg = EngineConfig(
        mode=args.mode,
        extract_mode=args.extract_mode,
        num_partitions=args.partitions,
        batch_size=args.batch_size,
    )

    if args.no_resume:
        import shutil

        shutil.rmtree(os.path.join(args.output, "_manifests"), ignore_errors=True)

    # shard the input by file for resumability (one shard per file group)
    if os.path.isdir(args.input):
        files = sorted(
            os.path.join(args.input, f)
            for f in os.listdir(args.input)
            if f.endswith(".parquet")
        )
    else:
        files = [args.input]
    if not files:
        print(json.dumps({"error": "no parquet inputs found"}), file=sys.stderr)
        return 2
    n_shards = max(1, min(args.shards, len(files)))
    groups = [files[i::n_shards] for i in range(n_shards)]

    shards = [
        (f"s{i:04d}", (lambda paths=paths: rd.read_parquet(paths)))
        for i, paths in enumerate(groups)
        if paths
    ]
    report = run_deid_job(shards, args.output, cfg, max_in_flight=args.max_in_flight)
    print(json.dumps(report))

    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
