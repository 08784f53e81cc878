#!/usr/bin/env python
"""Online pose-refinement server: HTTP front end + micro-batching over the
device-side serving pipeline (scflow_tpu/serving.py).

    python tools/serve.py configs/refine_models/scflow.py --checkpoint CKPT \
        [--host 0.0.0.0 --port 8080 --frame-hw 480 640] \
        [--max-objects 64 --max-delay-ms 5]

Clients POST npz payloads (frame, ref_rotations, ref_translations, k,
labels) to /v1/refine; see scflow_tpu.runtime.server.refine_remote for a
stdlib client.  Thin shim over `scflow_tpu.cli.serve_main` (also installed
as the `scflow-serve` console script).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.cli import serve_main

if __name__ == "__main__":
    serve_main()
