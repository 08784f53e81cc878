#!/usr/bin/env python
"""Training entry point (reference train.py CLI semantics):

    python tools/train.py configs/refine_models/scflow.py \
        [--work-dir DIR] [--resume-from CKPT_STEP] [--seed N] \
        [--max-iters N] [--cfg-options k=v ...]

Data-parallel over all visible chips via jax.sharding.Mesh; the global batch
is samples_per_gpu * n_devices (torch DDP-equivalent semantics).

Thin shim over `scflow_tpu.cli.train_main` (also installed as the
`scflow-train` console script).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
