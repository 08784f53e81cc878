"""Torch checkpoint conversion: reference/mmflow `.pth` state dicts -> flax
variables (params + batch_stats).

Covers the reference module naming produced by mmcv (SCFlowRefiner /
RAFTRefinerFlow(Mask) and the mmflow-RAFT init checkpoint after the
reference's encoder->real/render duplication, tools/mmflow_ckpt_converter.py:
29-41 — `duplicate_mmflow_encoder` reproduces that rule here).

Transforms: conv OIHW -> HWIO; linear (O, I) -> (I, O); BatchNorm
weight/bias/running_mean/running_var -> scale/bias/mean/var.  The pose-head
FC consumes an NCHW-ordered flatten in both frameworks (our trunk transposes
before flattening), so FC kernels convert with a plain transpose.
"""

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def duplicate_mmflow_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """mmflow RAFT ckpt rule: 'encoder.*' weights are copied into both
    'real_encoder.*' and 'render_encoder.*' (mmflow_ckpt_converter.py:29-41);
    'cxt_encoder.*' maps to 'context.*'."""
    out = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            rest = k[len("encoder."):]
            out[f"real_encoder.{rest}"] = v
            out[f"render_encoder.{rest}"] = v
        elif k.startswith("cxt_encoder."):
            out[f"context.{k[len('cxt_encoder.'):]}"] = v
        else:
            out[k] = v
    return out


def _flax_path_to_torch_key(path: Tuple[str, ...], leaf_name: str) -> Optional[str]:
    """Map a flax param path (module names) + leaf to the reference torch key
    prefix (without the .weight/.bias suffix)."""
    parts = list(path)
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r"layer(\d+)_block(\d+)", p)
        if m:
            out.append(f"res_layer{m.group(1)}.{m.group(2)}")
        elif p == "stem_conv":
            out.append("conv1")
        elif p == "stem_norm":
            out.append("__stem_norm__")  # resolved by norm kind below
        elif p == "out_conv":
            out.append("conv2")
        elif p == "downsample_conv":
            out.append("downsample.0")
        elif p == "downsample_norm":
            out.append("downsample.1")
        elif re.fullmatch(r"(corr_net|flow_net|out_net)(\d+)", p):
            m2 = re.fullmatch(r"(corr_net|flow_net|out_net)(\d+)", p)
            out.append(f"{m2.group(1)}.{m2.group(2)}")
        elif re.fullmatch(r"conv_([zrq])(\d+)", p):
            m2 = re.fullmatch(r"conv_([zrq])(\d+)", p)
            out.append(f"conv_{m2.group(1)}.{m2.group(2)}")
        elif re.fullmatch(r"delta_flow_enc(\d+)", p):
            out.append(f"delta_flow_encoder.{p[-1]}")
        elif re.fullmatch(r"mask_enc(\d+)", p):
            out.append(f"mask_encoder.{p[-1]}")
        elif re.fullmatch(r"layer(\d+)", p):  # XHead convs
            out.append(f"layers.{p[len('layer'):]}")
        elif p == "predict":
            out.append("predict_layer")
        elif p in ("trunk", "update"):
            pass  # structural levels absent from torch naming
        elif re.fullmatch(r"conv(\d+)", p) and "pose_pred" in parts[:i]:
            out.append(f"conv_layers.{p[len('conv'):]}")
        elif re.fullmatch(r"fc(\d+)", p):
            out.append(f"fc_layers.{p[len('fc'):]}.0")
        elif p in ("norm1", "norm2", "norm3"):
            out.append("__" + p + "__")
        elif re.fullmatch(r"stage(\d+)_block(\d+)", p):
            m2 = re.fullmatch(r"stage(\d+)_block(\d+)", p)
            out.append(f"layer{m2.group(1)}.{m2.group(2)}")
        elif re.fullmatch(r"stem(\d+)", p):
            out.append(f"stem.{p[len('stem'):]}")
        elif p == "avgdown_conv":
            out.append("downsample.1")
        elif p == "avgdown_norm":
            out.append("downsample.2")
        elif p == "norm":  # ConvModule norm
            out.append("__cm_norm__")
        elif p == "n":  # inner norm layer of _Norm
            pass
        elif p == "conv" and i == len(parts) - 1:
            out.append("conv")
        else:
            out.append(p)
        i += 1
    return ".".join(out)


def _resolve_norm_placeholder(key: str, kind: str) -> str:
    abbr = {"BN": "bn", "IN": "in", "GN": "gn"}[kind]
    key = key.replace("__stem_norm__", f"{abbr}1")
    key = key.replace("__norm1__", f"{abbr}1")
    key = key.replace("__norm2__", f"{abbr}2")
    key = key.replace("__norm3__", f"{abbr}3")
    key = key.replace("__cm_norm__", abbr)
    return key


_LEAF_MAP_PARAM = {"kernel": "weight", "bias": "bias", "scale": "weight"}
_LEAF_MAP_STATS = {"mean": "running_mean", "var": "running_var"}


def convert_state_dict_to_variables(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    encoder_norm: str = "IN",
    cxt_norm: str = "BN",
    strict: bool = True,
    root: str = "",
) -> Dict[str, Any]:
    """Fill a flax variables template (from model.init) with torch weights.
    Returns new {'params', 'batch_stats'} dict."""
    import jax

    missing = []

    def norm_kind_for(path):
        top = path[0]
        if top in ("render_encoder", "real_encoder"):
            return encoder_norm
        if top == "context":
            return cxt_norm
        if "pose_pred" in path:
            return "GN"
        return cxt_norm

    def fill(tree, collection):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for keypath, leaf in flat:
            path = tuple(
                k.key if hasattr(k, "key") else str(k) for k in keypath
            )
            map_path = (tuple(root.split(".")) + path) if root else path
            leaf_name = path[-1]
            torch_prefix = _flax_path_to_torch_key(map_path[:-1], leaf_name)
            torch_prefix = _resolve_norm_placeholder(
                torch_prefix, norm_kind_for(map_path)
            )
            leaf_map = _LEAF_MAP_PARAM if collection == "params" else _LEAF_MAP_STATS
            torch_key = f"{torch_prefix}.{leaf_map[leaf_name]}"
            if torch_key not in sd:
                missing.append(torch_key)
                out[path] = np.asarray(leaf)
                continue
            w = sd[torch_key]
            if leaf_name == "kernel" and w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)
            elif leaf_name == "kernel" and w.ndim == 2:
                w = w.T
            assert w.shape == leaf.shape, (torch_key, w.shape, leaf.shape)
            out[path] = w.astype(np.asarray(leaf).dtype)
        return out

    new_vars = {}
    for coll in variables:
        filled = fill(variables[coll], coll)
        # rebuild the nested dict
        tree: Dict[str, Any] = {}
        for path, val in filled.items():
            d = tree
            for k in path[:-1]:
                d = d.setdefault(k, {})
            d[path[-1]] = val
        new_vars[coll] = tree
    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]} (+{len(missing)-10 if len(missing)>10 else 0} more)")
    return new_vars


def convert_torch_checkpoint(
    path: str,
    variables: Dict[str, Any],
    encoder_norm: str = "IN",
    cxt_norm: str = "BN",
    mmflow: bool = False,
    strict: bool = True,
    manifest: Optional[Dict[str, Any]] = None,
):
    """manifest: a runtime.manifest key->shape table; when given, the RAW
    loaded state dict (pre-duplication for mmflow checkpoints) is verified
    against it FIRST, so a mismatched real checkpoint fails with a named
    key diff instead of a silent partial fill (MIGRATION.md guarantee)."""
    sd = load_torch_state_dict(path)
    is_mmflow = mmflow or not any(k.startswith("real_encoder.") for k in sd)
    if manifest is not None:
        from scflow_tpu.runtime.manifest import verify_state_dict

        # mmflow checkpoints carry a foreign decoder — those keys ride
        # along and are matched by name only (manifest.py docstring)
        allow = ("decoder.",) if is_mmflow else ()
        verify_state_dict(sd, manifest, allow_unexpected_prefixes=allow)
    if is_mmflow:
        sd = duplicate_mmflow_encoder(sd)
    return convert_state_dict_to_variables(
        sd, variables, encoder_norm, cxt_norm, strict=strict
    )
