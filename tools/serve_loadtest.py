#!/usr/bin/env python
"""Concurrent load test for the online serving server (tools/serve.py).

Drives POST /v1/refine with N client threads and reports achieved
request/object throughput plus client-side latency percentiles alongside
the server's own /v1/stats snapshot (batching efficiency).

    python tools/serve_loadtest.py --url http://127.0.0.1:8080 \
        [--clients 8] [--requests 50] [--objects 4] \
        [--frame-hw 480 640] [--num-class 21]
"""

import argparse
import json
import threading
import time
from urllib.request import urlopen

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.runtime.server import nearest_rank, refine_remote


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8080")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=50,
                   help="requests per client")
    p.add_argument("--objects", type=int, default=4, help="objects per request")
    p.add_argument("--frame-hw", type=int, nargs=2, default=[480, 640])
    p.add_argument("--num-class", type=int, default=21)
    p.add_argument("--timeout", type=float, default=120.0)
    args = p.parse_args()

    h, w = args.frame_hw
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    from scipy.spatial.transform import Rotation

    P = args.objects
    R = Rotation.random(P, 0).as_matrix().astype(np.float32)
    t = np.stack([rng.normal(size=P) * 50, rng.normal(size=P) * 30,
                  rng.uniform(700, 1100, P)], -1).astype(np.float32)
    K = np.array([[572.4, 0, w / 2], [0, 573.5, h / 2], [0, 0, 1]], np.float32)
    labels = rng.integers(0, args.num_class, P).astype(np.int32)

    lat, errs = [], []
    lock = threading.Lock()

    def client():
        for _ in range(args.requests):
            t0 = time.perf_counter()
            try:
                refine_remote(args.url, frame, R, t, K, labels,
                              timeout=args.timeout)
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
            except Exception as e:
                with lock:
                    errs.append(str(e))

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    lat.sort()

    def q(p):
        v = nearest_rank(lat, p)
        return None if v is None else v * 1e3

    n_ok = len(lat)
    print(json.dumps({
        "requests_ok": n_ok,
        "requests_failed": len(errs),
        "wall_s": round(wall, 2),
        "requests_per_s": round(n_ok / wall, 2) if wall else None,
        "objects_per_s": round(n_ok * args.objects / wall, 2) if wall else None,
        "latency_ms": {"p50": round(q(0.50), 1) if lat else None,
                       "p95": round(q(0.95), 1) if lat else None,
                       "p99": round(q(0.99), 1) if lat else None},
    }))
    if errs:
        print("first error:", errs[0])
    try:
        print("server stats:", urlopen(args.url.rstrip("/") + "/v1/stats",
                                       timeout=10).read().decode())
    except Exception as e:
        print(f"(stats endpoint unavailable: {e})")


if __name__ == "__main__":
    main()
