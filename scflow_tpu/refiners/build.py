"""Adapter from reference-style model config dicts (configs/refine_models/*)
to the flax refiner modules.  Keeps the reference's config key names
(SURVEY.md §5 'Config / flag system') so configs port 1:1."""

from typing import Any, Dict

import jax.numpy as jnp

from scflow_tpu.refiners.raft import RAFTRefinerFlow, RAFTRefinerFlowMask
from scflow_tpu.refiners.scflow import SCFlowRefiner

_DTYPES = {None: None, "fp32": None, "float32": None,
           "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}


def _norm_of(enc_cfg: Dict[str, Any], default: str) -> str:
    return (enc_cfg or {}).get("norm_cfg", {}).get("type", default)


def build_refiner_from_config(model_cfg: Dict[str, Any]):
    cfg = dict(model_cfg)
    mtype = cfg["type"]
    enc = cfg.get("encoder", {})
    cxt = cfg.get("cxt_encoder", {})
    dec = dict(cfg.get("decoder", {}))
    common = dict(
        seperate_encoder=cfg.get("seperate_encoder", False),
        h_channels=cfg.get("h_channels", 128),
        cxt_channels=cfg.get("cxt_channels", 128),
        encoder_out_channels=enc.get("out_channels", 256),
        encoder_norm=_norm_of(enc, "IN"),
        cxt_norm=_norm_of(cxt, "BN"),
        net_type=dec.get("net_type", "Basic"),
        num_levels=dec.get("num_levels", 4),
        radius=dec.get("radius", 4),
        iters=dec.get("iters", 8),
        gru_type=dec.get("gru_type", "SeqConv"),
        max_flow=cfg.get("max_flow", 400.0),
        dtype=_DTYPES[cfg.get("dtype")],
    )
    if mtype == "SCFlowRefiner":
        return SCFlowRefiner(
            detach_flow=dec.get("detach_flow", True),
            detach_mask=dec.get("detach_mask", True),
            detach_pose=dec.get("detach_pose", True),
            detach_depth_for_xy=dec.get("detach_depth_for_xy", False),
            mask_flow=dec.get("mask_flow", False),
            mask_corr=dec.get("mask_corr", False),
            depth_transform=dec.get("depth_transform", "exp"),
            pose_head_cfg=dict(dec.get("pose_head_cfg", {"type": "MultiClassPoseHead"})),
            unroll=dec.get("unroll", cfg.get("unroll", True)),
            **common,
        )
    if mtype == "RAFTRefinerFlow":
        common["iters"] = dec.get("iters", 12)
        return RAFTRefinerFlow(
            convex_upsample_flow=dec.get("convex_unsample_flow", True), **common
        )
    if mtype == "RAFTRefinerFlowMask":
        common["iters"] = dec.get("iters", 12)
        return RAFTRefinerFlowMask(
            convex_upsample_flow=dec.get("convex_unsample_flow", True), **common
        )
    raise KeyError(f"unknown refiner type {mtype}")
