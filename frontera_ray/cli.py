"""CLI entry points — the `ray job submit` surface (replaces the reference
worker CLIs: python -m frontera.worker.strategy / frontera.worker.db /
zeromq broker, SURVEY.md §3.3; here ONE driver runs the epoch loop and Ray
Data fans the stages out).

Usage (module form; also works via `ray job submit -- python -m
frontera_ray.cli crawl ...`):

  python -m frontera_ray.cli synth --out /tmp/fx --spec smoke|conformance|bench
  python -m frontera_ray.cli crawl --pages '/tmp/fx/pages/*.parquet' \
      --seeds /tmp/fx/seeds.parquet --checkpoint /tmp/ck \
      --policy bfs --epochs 10 --partitions 8 [--resume] \
      [--max-per-host 2] [--max-next 64] [--revisit-after N]
  python -m frontera_ray.cli artifacts --checkpoint /tmp/ck   # counters summary
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_synth(args) -> int:
    from .sources import synth

    spec = {"smoke": synth.SMOKE, "conformance": synth.CONFORMANCE,
            "bench": synth.BENCH}[args.spec]
    out = synth.write_fixture(args.out, spec, overwrite=args.overwrite)
    print(json.dumps({"pages_dir": out["pages_dir"], "seeds": out["seeds_path"],
                      "parts": len(out["parts"])}))
    return 0


def cmd_crawl(args) -> int:
    _ensure_ray(args.num_cpus)
    from .config import CrawlConfig
    from .pipelines.crawl import run_crawl

    pages = sorted(glob.glob(args.pages)) if any(c in args.pages for c in "*?[") \
        else sorted(
            os.path.join(args.pages, f)
            for f in os.listdir(args.pages)
            if f.endswith(".parquet")
        )
    if not pages:
        print(f"no parquet files match {args.pages!r}", file=sys.stderr)
        return 2
    cfg = CrawlConfig(
        pages_paths=pages,
        seeds_path=args.seeds,
        checkpoint_dir=args.checkpoint,
        policy=args.policy,
        max_epochs=args.epochs,
        num_partitions=args.partitions,
        max_requests_per_host=args.max_per_host,
        max_next_requests=args.max_next,
        revisit_after_epochs=args.revisit_after,
        obey_robots=not args.ignore_robots,
        follow_sitemaps=args.follow_sitemaps,
        assume_canonical_pages=args.assume_canonical,
    )
    _, summary = run_crawl(cfg, resume=args.resume)
    print(json.dumps(summary))
    import ray

    ray.shutdown()
    return 0


def cmd_artifacts(args) -> int:
    from .sources.checkpoint import Checkpoint

    ck = Checkpoint(args.checkpoint)
    latest = ck.latest_complete()
    if latest is None:
        print("no completed epochs", file=sys.stderr)
        return 1
    counters = ck.read_all("counters.parquet")
    summary: dict[str, int] = {}
    if counters is not None:
        df = counters.to_pandas().groupby("metric")["value"].sum()
        summary = {k: int(v) for k, v in df.items()}
    print(json.dumps({"latest_epoch": latest, "totals": summary}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="frontera_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="write a deterministic pages fixture")
    ps.add_argument("--out", required=True)
    ps.add_argument("--spec", choices=["smoke", "conformance", "bench"], default="smoke")
    ps.add_argument("--overwrite", action="store_true")
    ps.set_defaults(fn=cmd_synth)

    pc = sub.add_parser("crawl", help="run the epoch-loop crawl")
    pc.add_argument("--pages", required=True, help="dir or glob of parquet parts")
    pc.add_argument("--seeds", required=True)
    pc.add_argument("--checkpoint", required=True)
    pc.add_argument("--policy", default="bfs")
    pc.add_argument("--epochs", type=int, default=20)
    pc.add_argument("--partitions", type=int, default=4)
    pc.add_argument("--max-per-host", type=int, default=2)
    pc.add_argument("--max-next", type=int, default=64)
    pc.add_argument("--revisit-after", type=int, default=None)
    pc.add_argument("--ignore-robots", action="store_true")
    pc.add_argument(
        "--assume-canonical", action="store_true",
        help="pages table stores canonical urls: push the scheduled-url "
        "filter into the parquet scan (skip per-row canonicalization)",
    )
    pc.add_argument("--follow-sitemaps", action="store_true")
    pc.add_argument("--resume", action="store_true")
    pc.add_argument("--num-cpus", type=int, default=None)
    pc.set_defaults(fn=cmd_crawl)

    pa_ = sub.add_parser("artifacts", help="summarize a checkpoint dir")
    pa_.add_argument("--checkpoint", required=True)
    pa_.set_defaults(fn=cmd_artifacts)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
