#!/usr/bin/env python
"""Host data-pipeline throughput bench.

The train step consumes ~101 samples/s/chip at batch 16 fp32
(docs/PERFORMANCE.md); the host pipeline must sustain that rate or the
chip starves.  This tool measures (a) the single-thread pipeline rate
(one `dataset[i]` at a time — the per-core ceiling) and (b) the DataLoader
rate with its worker pool, plus an optional per-transform wall-time
breakdown (Compose profiling).

    python tools/bench_pipeline.py CONFIG [--split train] [--samples 64]
        [--batches 8] [--workers 8] [--profile]

Reference analog: none (torch DataLoader tuning is folklore there); cites
the pipeline inventory at SURVEY.md §2.1 / reference
`datasets/pipelines/*.py`.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--samples", type=int, default=64,
                   help="single-thread getitem count")
    p.add_argument("--batches", type=int, default=8,
                   help="DataLoader batches to time")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--worker-mode", choices=["thread", "process"],
                   default="thread")
    p.add_argument("--profile", action="store_true",
                   help="per-transform wall-time breakdown")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    if args.profile:
        os.environ["SCFLOW_PIPELINE_PROFILE"] = "1"

    from scflow_tpu.config import Config
    from scflow_tpu.datasets import DataLoader, build_dataset

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(Config.parse_options(args.cfg_options))
    dataset = build_dataset(cfg.data[args.split])
    n = len(dataset)

    def transformers(ds):
        """Compose objects of ds, descending into ConcatDataset members."""
        if hasattr(ds, "transformer"):
            return [ds.transformer]
        return [t for d in getattr(ds, "datasets", [])
                for t in transformers(d)]

    pipes = transformers(dataset)
    shown = f"\n{pipes[0]}" if pipes else " (no pipeline attribute)"
    print(f"dataset: {n} samples, pipeline:{shown}")

    # (a) single-thread ceiling
    t0 = time.perf_counter()
    done = 0
    i = 0
    while done < args.samples:
        if dataset[i % n] is not None:
            done += 1
        i += 1
    single = done / (time.perf_counter() - t0)
    print(f"single-thread: {single:.1f} samples/s "
          f"({1e3 / single:.1f} ms/sample)")

    # (b) loader with worker pool + prefetch
    loader = DataLoader(
        dataset, samples_per_step=args.batch_size,
        num_workers=args.workers, infinite=True,
        worker_mode=args.worker_mode,
    )
    it = iter(loader)
    next(it)  # warm the pool / prefetch queue
    t0 = time.perf_counter()
    for _ in range(args.batches):
        next(it)
    dt = time.perf_counter() - t0
    it.close()
    loaded = args.batches * args.batch_size / dt
    print(f"loader ({args.workers} {args.worker_mode} workers): "
          f"{loaded:.1f} samples/s (scaling x{loaded / single:.2f})")
    # the loader buffers prefetch*batch samples + a results queue: a timing
    # window smaller than that measures queue pops, not production
    buffered = args.batch_size * (loader.prefetch + 1) + args.workers * 2
    if args.batches * args.batch_size <= buffered:
        print(f"(note: window <= the ~{buffered}-sample buffer — increase "
              "--batches for a steady-state rate)")

    stats = {}
    for tr in pipes:
        for name, (calls, sec) in getattr(tr, "profile_stats", {}).items():
            cell = stats.setdefault(name, [0, 0.0])
            cell[0] += calls
            cell[1] += sec
    if args.profile and stats:
        if args.worker_mode == "process":
            print("\n(note: the table covers main-process calls only — "
                  "spawned loader workers profile in their own processes)")
        total = sum(s for _, s in stats.values()) or 1e-9
        rows = sorted(stats.items(), key=lambda kv: -kv[1][1])
        print(f"\n{'transform':<24}{'calls':>7}{'ms/call':>10}{'share':>8}")
        for name, (calls, sec) in rows:
            if not calls:
                continue
            print(f"{name:<24}{calls:>7}{sec / calls * 1e3:>10.2f}"
                  f"{sec / total * 100:>7.1f}%")

    print(json.dumps({
        "single_thread_samples_per_s": round(single, 2),
        "loader_samples_per_s": round(loaded, 2),
        "workers": args.workers,
        "worker_mode": args.worker_mode,
        "train_step_demand_samples_per_s": 101.1,
    }))


if __name__ == "__main__":
    main()
