"""CLI entry point: run a synthetic crawl or the refine pipeline.

Examples
--------
    python -m crawler_ray crawl --sites 8 --pages 200 --max-pages 60 \
        --out /tmp/out/pages --ckpt /tmp/out/ckpt --parallel
    python -m crawler_ray refine --sf-dir /root/testdata/sf0.001
    python -m crawler_ray compact --input /tmp/out/pages --output /tmp/out/compact

The CLI owns its Ray session (the driver contract in __ray_entry__
never does).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crawler_ray")
    ap.add_argument("--num-cpus", type=int, default=8)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="crawl the deterministic synthetic web")
    c.add_argument("--sites", type=int, default=4)
    c.add_argument("--pages", type=int, default=200)
    c.add_argument("--max-pages", type=int, default=60)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--shards", type=int, default=2)
    c.add_argument("--out", default=None)
    c.add_argument("--ckpt", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--parallel", action="store_true")
    c.add_argument("--feedback", action="store_true")
    c.add_argument("--robots", action="store_true")

    r = sub.add_parser("refine", help="run the flagship refine pipeline")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--out", default=None)

    k = sub.add_parser("compact", help="compact small parquet files")
    k.add_argument("--input", required=True)
    k.add_argument("--output", required=True)

    args = ap.parse_args(argv)

    import ray

    if args.num_cpus <= 0:
        # cluster mode (`ray job submit`): connect to the running
        # cluster and let per-stage concurrency/num_cpus size the work
        ray.init(
            address="auto",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        args.num_cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from crawler_ray.context import configure_default

    configure_default()
    try:
        if args.cmd == "crawl":
            from crawler_ray.pipelines.crawl import CrawlEngine
            from crawler_ray.sources.synth import demo_web, seeds_table

            web = demo_web(n_sites=args.sites, n_pages=args.pages, seed=args.seed)
            seeds = seeds_table(web, max_pages=args.max_pages).to_pylist()
            eng = CrawlEngine(
                web,
                seeds,
                num_shards=args.shards,
                output_dir=args.out,
                checkpoint_dir=args.ckpt,
                feedback=args.feedback,
                robots_enabled=args.robots,
                fetch_concurrency=args.num_cpus,
            )
            if args.parallel:
                starts = None
                if args.resume and args.ckpt:
                    starts = eng.restore_parallel()
                print(json.dumps(eng.run_parallel(start_waves=starts)))
            else:
                if args.resume and args.ckpt:
                    ck = CrawlEngine.latest_checkpoint(args.ckpt)
                    if ck:
                        eng.restore(ck)
                print(json.dumps(eng.run()))
        elif args.cmd == "refine":
            from crawler_ray.pipelines.flagship import refine_documents

            ds = refine_documents(args.sf_dir, concurrency=max(2, args.num_cpus // 4))
            if args.out:
                ds.write_parquet(args.out)
                print(json.dumps({"written": args.out}))
            else:
                n = acc = 0
                for b in ds.iter_batches(batch_format="pyarrow"):
                    n += b.num_rows
                    acc += sum(1 for v in b["accepted"].to_pylist() if v)
                print(json.dumps({"rows": n, "accepted": acc}))
        elif args.cmd == "compact":
            from crawler_ray.sources.io import compact_parquet

            n = compact_parquet(args.input, args.output)
            print(json.dumps({"rows": n, "output": args.output}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
