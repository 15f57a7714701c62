#!/usr/bin/env python
"""Job entrypoint for the flagship extraction pipeline — submitted on a
cluster via ``ray job submit -- python scripts/run_extract.py ...``; runs
locally the same way. Resumable: re-running skips completed partitions.

Example:
    python scripts/run_extract.py --input /tmp/corpus --output /tmp/out
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir of DOCS-schema parquet shards")
    p.add_argument("--output", required=True, help="partitioned output dir")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None, help="local ray.init size")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from pdfplumber_ray.config import PipelineConfig
        from pdfplumber_ray.state import run_resumable_extract

        summary = run_resumable_extract(
            args.input, args.output, PipelineConfig(batch_size=args.batch_size)
        )
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
