#!/usr/bin/env python
"""Export the jitted inference graph as a portable StableHLO artifact.

    python tools/export_model.py configs/refine_models/scflow.py \
        --checkpoint CKPT --out scflow_ycbv.scflowx \
        [--batch-size 16] [--platforms tpu cpu]

The artifact bakes the weights in as constants; serve it with
`scflow_tpu.runtime.export.load_exported(path)` — no model code, config
system, or checkpoint format needed at the deployment site (the reference
has no export story: deploying it means shipping the full repo + .pth).
Thin shim over `scflow_tpu.cli.export_main` (also installed as the
`scflow-export` console script).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.cli import export_main

if __name__ == "__main__":
    export_main()
