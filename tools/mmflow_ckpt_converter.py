#!/usr/bin/env python
"""Convert an mmflow RAFT torch checkpoint into (a) the reference's
duplicated-encoder torch layout and/or (b) flax orbax params for this
framework (reference tools/mmflow_ckpt_converter.py:19-41).

    python tools/mmflow_ckpt_converter.py raft_8x2_100k_flyingthings3d.pth \
        --config configs/refine_models/scflow.py --out work_dirs/raft_init
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import apply_env_platform

apply_env_platform()

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="mmflow RAFT .pth")
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True, help="orbax output dir")
    p.add_argument("--save-torch", default=None,
                   help="also write the duplicated-encoder .pth")
    p.add_argument("--strict", action="store_true",
                   help="verify the checkpoint against the transcribed "
                        "reference state-dict manifest first; fail with a "
                        "named key diff on any mismatch")
    args = p.parse_args()

    from scflow_tpu.apis import build_render_assets, init_model_variables
    from scflow_tpu.config import Config
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.runtime import (
        convert_torch_checkpoint,
        duplicate_mmflow_encoder,
        load_torch_state_dict,
        save_params,
    )

    cfg = Config.fromfile(args.config)
    image_size = tuple(cfg.model["renderer"].get("image_size", (256, 256)))
    model = build_refiner_from_config(cfg.model)
    variables = init_model_variables(cfg.model, model, image_size)

    if args.save_torch:
        import torch

        sd = load_torch_state_dict(args.checkpoint)
        dup = duplicate_mmflow_encoder(sd)
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in dup.items()}},
                   args.save_torch)
        print(f"wrote duplicated torch checkpoint {args.save_torch}")

    enc_norm = cfg.model.get("encoder", {}).get("norm_cfg", {}).get("type", "IN")
    cxt_norm = cfg.model.get("cxt_encoder", {}).get("norm_cfg", {}).get("type", "BN")
    manifest = None
    if args.strict:
        from scflow_tpu.runtime.manifest import mmflow_raft_manifest

        manifest = mmflow_raft_manifest()
    converted = convert_torch_checkpoint(
        args.checkpoint, jax.tree_util.tree_map(np.asarray, variables),
        encoder_norm=enc_norm, cxt_norm=cxt_norm, mmflow=True, strict=False,
        manifest=manifest,
    )
    save_params(args.out, converted["params"], converted.get("batch_stats"))
    print(f"wrote flax params {args.out}")


if __name__ == "__main__":
    main()
