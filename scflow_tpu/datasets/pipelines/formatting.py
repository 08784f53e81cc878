"""Pipeline composition and output formatting.

ToArray replaces the reference's ToTensor (formatting.py:94-148): patches are
stacked to NHWC float arrays (the TPU-native layout) instead of NCHW torch
tensors; masks are packed to (n, H, W) uint8.  Collect splits annot/meta keys
exactly like the reference (formatting.py:150-180)."""

from typing import Dict, Sequence

import numpy as np

from scflow_tpu.datasets.mask import BitmapMasks
from scflow_tpu.registry import PIPELINES


@PIPELINES.register_module("Compose")
class Compose:
    """Transform chain (reference `datasets/pipelines/formatting.py:183-217`
    semantics: None from any transform aborts the sample).

    Set env SCFLOW_PIPELINE_PROFILE=1 (or `profile=True`) to accumulate
    per-transform wall time into `self.profile_stats` — the observability
    hook behind `tools/bench_pipeline.py --profile`.
    """

    def __init__(self, transforms: Sequence, profile: bool = False):
        import os

        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(PIPELINES.build(t))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError(t)
        self.profile = profile or bool(os.environ.get("SCFLOW_PIPELINE_PROFILE"))
        if self.profile:
            self._init_profile()

    def _init_profile(self):
        import threading

        self._lock = threading.Lock()
        self.profile_stats = {
            t.__class__.__name__: [0, 0.0] for t in self.transforms
        }

    def __getstate__(self):
        # keep datasets picklable for spawn-based loader workers: the
        # profiling lock can't cross a process boundary (stats restart
        # empty in the child — each process profiles its own work)
        state = self.__dict__.copy()
        state.pop("_lock", None)
        state.pop("profile_stats", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if self.profile:
            self._init_profile()

    def __call__(self, data):
        if not self.profile:
            for t in self.transforms:
                data = t(data)
                if data is None:
                    return None
            return data
        import time

        for t in self.transforms:
            t0 = time.perf_counter()
            data = t(data)
            dt = time.perf_counter() - t0
            with self._lock:
                cell = self.profile_stats[t.__class__.__name__]
                cell[0] += 1
                cell[1] += dt
            if data is None:
                return None
        return data

    def __repr__(self):
        inner = "\n".join(f"    {t.__class__.__name__}" for t in self.transforms)
        return f"Compose(\n{inner}\n)"


@PIPELINES.register_module("CopyFields")
class CopyFields:
    """Copy result fields src[i] -> dst[i] (deep-copied arrays).

    Used by pipeline surgery (`tools/browse_dataset.py --skip-types
    PoseJitter`): skipping the jitter must still seed the `ref_*` pose
    fields the downstream transforms consume, i.e. ref = gt."""

    def __init__(self, src: Sequence[str], dst: Sequence[str]):
        assert len(src) == len(dst)
        self.src = list(src)
        self.dst = list(dst)

    def __call__(self, results: Dict) -> Dict:
        for s, d in zip(self.src, self.dst):
            v = results[s]
            results[d] = np.copy(v) if isinstance(v, np.ndarray) else v
        return results


@PIPELINES.register_module("ToArray")
@PIPELINES.register_module("ToTensor")  # config-name compatibility
class ToArray:
    def __init__(self, stack_keys=("img",)):
        self.stack_keys = stack_keys

    def __call__(self, results):
        for key in results.get("image_fields", ["img"]):
            img = results[key]
            if isinstance(img, (list, tuple)):
                img = [i[..., None] if i.ndim == 2 else i for i in img]
                img = np.stack(img, axis=0)
            results[key] = np.ascontiguousarray(img, dtype=np.float32)
        for field in results.get("mask_fields", []):
            masks = results[field]
            if isinstance(masks, (list, tuple)):
                flat = []
                for m in masks:
                    flat.extend(list(m.masks) if isinstance(m, BitmapMasks) else [m])
                if flat:
                    h, w = flat[0].shape
                    results[field] = BitmapMasks(flat, h, w)
                else:
                    results[field] = BitmapMasks([], 0, 0)
        return results


@PIPELINES.register_module("Collect")
class Collect:
    def __init__(self, keys=("img",), annot_keys=None,
                 meta_keys=("img_path", "ori_shape", "ori_k", "k", "img_shape",
                            "img_norm_cfg")):
        self.keys = keys
        self.annot_keys = annot_keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data: Dict = {}
        annot_keys = self.annot_keys or results.get("annot_fields", [])
        img_meta = {k: results[k] for k in self.meta_keys if k in results}
        annot = {k: results[k] for k in annot_keys if k in results}
        for k in self.keys:
            data[k] = results[k]
        data["img_metas"] = img_meta
        if annot:
            data["annots"] = annot
        return data
