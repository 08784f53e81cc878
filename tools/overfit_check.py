#!/usr/bin/env python
"""Learning sanity check: overfit one synthetic batch on the current device.

Run on TPU: ~3 min; expected outcome: train-batch ADD/d drives from ~0.18
(the injected pose noise) below 0.01 within 2000 steps, demonstrating the
full render->recurrence->loss->optimizer chain learns pose refinement.
(Measured on v5e: init 0.179 -> 0.0034 at step 2000.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import apply_env_platform

apply_env_platform()

import time
import numpy as np
import jax, jax.numpy as jnp
from scflow_tpu.refiners import SCFlowRefiner
from scflow_tpu.refiners.system import (LossAssets, RenderAssets,
    make_scflow_train_step, make_scflow_infer_fn, render_and_normalize)
from scflow_tpu.render.meshbank import make_synthetic_bank
from scflow_tpu.losses.point_matching import sym_mask_from_types
from scflow_tpu.runtime import TrainState, build_optimizer
from scipy.spatial.transform import Rotation

H = 128; NCLASS = 3; BATCH = 8
bank = make_synthetic_bank(NCLASS, kind="cube", size=80.0, subdivisions=2)
ra = RenderAssets.from_bank(bank)
la = LossAssets(jnp.asarray(bank.verts), jnp.asarray(bank.vert_valid),
                sym_mask_from_types({}, NCLASS), jnp.asarray(bank.diameters))

def make_batch(seed):
    r = np.random.default_rng(seed)
    gt_R = Rotation.random(BATCH, seed).as_matrix().astype(np.float32)
    gt_t = np.stack([r.normal(size=BATCH)*15, r.normal(size=BATCH)*15, r.uniform(550,700,BATCH)], -1).astype(np.float32)
    dR = Rotation.from_euler("xyz", r.normal(size=(BATCH,3))*8, degrees=True).as_matrix().astype(np.float32)
    ref_R = np.einsum("nij,njk->nik", dR, gt_R)
    ref_t = gt_t + r.normal(size=(BATCH,3)).astype(np.float32)*np.array([6,6,18],np.float32)
    K = np.tile(np.array([[[280.,0,64],[0,280.,64],[0,0,1]]], np.float32), (BATCH,1,1))
    labels = r.integers(0, NCLASS, BATCH).astype(np.int32)
    real, _, gtm = render_and_normalize(ra, jnp.asarray(gt_R), jnp.asarray(gt_t), jnp.asarray(K), jnp.asarray(labels), (H,H), (0.,0.,0.), (255.,)*3)
    return dict(real_images=real, ref_rotations=jnp.asarray(ref_R), ref_translations=jnp.asarray(ref_t),
                gt_rotations=jnp.asarray(gt_R), gt_translations=jnp.asarray(gt_t),
                labels=jnp.asarray(labels), k=jnp.asarray(K), gt_masks=gtm)

def add_err(R, t, gt_R, gt_t, labels):
    pts = bank.verts[labels]; valid = bank.vert_valid[labels]
    a = np.einsum("nij,nvj->nvi", np.asarray(R), pts) + np.asarray(t)[:, None]
    b = np.einsum("nij,nvj->nvi", gt_R, pts) + gt_t[:, None]
    d = np.linalg.norm(a-b, axis=-1)
    d = (d*valid).sum(1)/valid.sum(1)
    return d / bank.diameters[labels]

model = SCFlowRefiner(iters=4, detach_depth_for_xy=True,
    pose_head_cfg=dict(type="MultiClassPoseHead", num_class=NCLASS, in_channels=224))
batch = make_batch(7)
key = jax.random.PRNGKey(0)
variables = model.init(key, batch["real_images"], batch["real_images"], batch["ref_rotations"],
                       batch["ref_translations"], jnp.zeros((BATCH,H,H)), batch["k"], batch["labels"])
tx, _ = build_optimizer(dict(type="AdamW", lr=4e-4, weight_decay=1e-4), None, 10.0)
state = TrainState.create(variables["params"], tx, variables.get("batch_stats"))
step = make_scflow_train_step(model, ra, la, image_size=(H,H))
infer = make_scflow_infer_fn(model, ra, image_size=(H,H))
a0 = add_err(np.asarray(batch["ref_rotations"]), np.asarray(batch["ref_translations"]),
             np.asarray(batch["gt_rotations"]), np.asarray(batch["gt_translations"]), np.asarray(batch["labels"]))
print(f"init ADD/d {a0.mean():.4f}", flush=True)
for i in range(2000):
    state, logs = step(state, batch)
    if (i+1) % 200 == 0:
        vn = {"params": state.params, "batch_stats": state.batch_stats}
        out = infer(vn, batch)
        a = add_err(np.asarray(out["rotations"]), np.asarray(out["translations"]),
                    np.asarray(batch["gt_rotations"]), np.asarray(batch["gt_translations"]), np.asarray(batch["labels"]))
        print(f"step {i+1}: pose {float(logs['loss_pose']):.3f} flow {float(logs['loss_flow']):.3f} | train-batch ADD {a.mean():.4f}", flush=True)
