#!/usr/bin/env python
"""Evaluation / BOP-export entry point (reference test.py CLI semantics,
with the --out flag actually defined — SURVEY.md §2.4 item 1):

    python tools/test.py configs/refine_models/scflow.py --checkpoint CKPT \
        [--eval | --format-only --save-dir DIR] [--out results.json] \
        [--eval-options k=v ...]

Thin shim over `scflow_tpu.cli.test_main` (also installed as the
`scflow-test` console script).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.cli import test_main

if __name__ == "__main__":
    test_main()
