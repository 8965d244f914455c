"""``ray job submit`` entrypoint for the flagship quality-filter pipeline.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/run_pipeline.py --input <clips-uri> --output <table-uri> \
            --checkpoint <ckpt-uri> --resume --num-partitions 64

Locally (this sandbox) the same command runs against `address="local"`.
The script owns the Ray session (library code never calls ray.init; the
init is guarded so it also works under a driver that already initialized
Ray). Input is either a lancelite table (dir with ``_versions/``) or a
plain parquet directory. With ``--resume`` the run goes through the
per-partition lineage manifest (pipelines/resumable.py): a re-submitted
job skips every committed partition.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="clips table uri (lancelite dir or parquet dir)")
    p.add_argument("--output", required=True, help="output lancelite uri")
    p.add_argument("--checkpoint", default=None,
                   help="scored-table checkpoint uri (enables --resume)")
    p.add_argument("--resume", action="store_true",
                   help="partitioned scoring with lineage manifest; skip "
                        "committed partitions on re-submit")
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--scorer-actors", type=int, default=0,
                   help="fixed scorer pool size (0 = cluster CPUs - 2)")
    p.add_argument("--dedup", choices=["first", "none", "off"], default="first")
    p.add_argument("--z-cut", type=float, default=None)
    p.add_argument("--no-payload", action="store_true",
                   help="emit the slim decision table (no audio passthrough)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local only: ray.init(num_cpus=...)")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parse_args(argv)
    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)

    import __ray_entry__
    __ray_entry__._setup()
    import ray.data as rd

    from common_crawl_corpus_ray.functions import spec
    from common_crawl_corpus_ray.pipelines import quality_filter, resumable
    from common_crawl_corpus_ray.pipelines.config import PipelineConfig
    from common_crawl_corpus_ray.sources import lancelite

    n_act = args.scorer_actors or max(2, quality_filter._cluster_cpus() - 2)
    cfg = PipelineConfig(
        batch_size=args.batch_size,
        scorer_concurrency=(2, n_act),
        z_cut=args.z_cut if args.z_cut is not None else spec.Z_CUT,
        dedup=args.dedup,
        checkpoint_uri=args.checkpoint,
        attach_payload=not args.no_payload,
        num_partitions=args.num_partitions,
    )

    t0 = time.perf_counter()
    if args.resume:
        if not args.checkpoint:
            raise SystemExit("--resume requires --checkpoint")
        from common_crawl_corpus_ray.state import manifest
        resumable.run_resumable(
            args.input, args.checkpoint, args.output, config=cfg)
        rows = lancelite.count_rows(args.output)
        summary = {"partitions_completed":
                   len(manifest.completed(args.checkpoint))}
    else:
        is_lance = os.path.isdir(os.path.join(args.input, "_versions"))
        clips_ds = lancelite.read(args.input) if is_lance \
            else rd.read_parquet(args.input)
        slim_ds = (lancelite.read(args.input, columns=["clip_id", "transcript"])
                   if is_lance else
                   rd.read_parquet(args.input, columns=["clip_id", "transcript"]))
        quality_filter.run(clips_ds, final_uri=args.output,
                           slim_ds=slim_ds, config=cfg)
        rows = lancelite.count_rows(args.output)
        summary = {}

    out = {
        "input": args.input, "output": args.output, "rows_out": rows,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "resumed": bool(args.resume),
        **(summary if args.resume else {}),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
    import ray
    ray.shutdown()
