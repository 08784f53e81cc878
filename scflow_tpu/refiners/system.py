"""End-to-end training/inference step builders: render -> network -> losses.

This is the functional replacement for the reference's BaseRefiner
format/train/forward protocol (models/refiner/base_refiner.py:79-343 and
scflow_refiner.py:184-258): one jitted function renders the batch at the
reference poses on-device, runs the recurrent network, composes the
sequence losses, and applies the optimizer update.
"""

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from scflow_tpu.geometry.flow import filter_flow_by_mask, flow_from_pose_and_depth
from scflow_tpu.losses.basic import l1_loss, raft_loss
from scflow_tpu.losses.point_matching import disentangle_point_matching_loss
from scflow_tpu.render.renderer import render_batch
from scflow_tpu.runtime.train_state import TrainState
from scflow_tpu.utils.platform import resolve_backend


class LossAssets(NamedTuple):
    """Padded vertex banks for the point-matching loss (models_eval meshes)."""

    points: jnp.ndarray  # (C, V, 3)
    valid: jnp.ndarray  # (C, V) bool
    sym: jnp.ndarray  # (C,) bool
    diameters: jnp.ndarray  # (C,)


class RenderAssets(NamedTuple):
    """Device-resident mesh bank for the renderer (models_1024 meshes)."""

    verts: jnp.ndarray
    faces: jnp.ndarray
    face_valid: jnp.ndarray
    colors: jnp.ndarray
    normals: jnp.ndarray
    vert_valid: jnp.ndarray

    @classmethod
    def from_bank(cls, bank) -> "RenderAssets":
        return cls(
            jnp.asarray(bank.verts),
            jnp.asarray(bank.faces),
            jnp.asarray(bank.face_valid),
            jnp.asarray(bank.colors),
            jnp.asarray(bank.normals),
            jnp.asarray(bank.vert_valid),
        )


def loss_assets_from_bank(bank, symmetry_types: dict, mesh_diameter=None) -> LossAssets:
    from scflow_tpu.losses.point_matching import sym_mask_from_types

    diam = (
        jnp.asarray(mesh_diameter, jnp.float32)
        if mesh_diameter is not None
        else jnp.asarray(bank.diameters)
    )
    return LossAssets(
        points=jnp.asarray(bank.verts),
        valid=jnp.asarray(bank.vert_valid),
        sym=sym_mask_from_types(symmetry_types, bank.num_class),
        diameters=diam,
    )




def render_and_normalize(
    render_assets: RenderAssets,
    ref_rotations,
    ref_translations,
    k,
    labels,
    image_size: Tuple[int, int],
    norm_mean,
    norm_std,
    chunk: int = 64,
    backend: str = "xla",
    augment_fn=None,
    augment_key=None,
    cull_backfaces: bool = False,
):
    """Render at the reference pose and normalize like the data pipeline
    (base_refiner.py:153-166: image/255-space mean/std).  augment_fn
    (models/augment.py, the render_augmentations config key) runs on the
    [0, 1] rendered images BEFORE normalization — same ordering as the
    reference (base_refiner.py:159-166)."""
    backend = resolve_backend(backend)
    h, w = image_size
    out = render_batch(
        render_assets.verts,
        render_assets.faces,
        render_assets.face_valid,
        render_assets.colors,
        render_assets.normals,
        render_assets.vert_valid,
        ref_rotations,
        ref_translations,
        k,
        labels,
        h,
        w,
        chunk=chunk,
        backend=backend,
        cull_backfaces=cull_backfaces,
    )
    images = out["images"]
    if augment_fn is not None:
        images = augment_fn(augment_key, images)
    mean = jnp.asarray(norm_mean, jnp.float32) / 255.0
    std = jnp.asarray(norm_std, jnp.float32) / 255.0
    images = (images - mean) / std
    return images, out["depths"], out["masks"]


def render_depth(
    render_assets: RenderAssets,
    rotations,
    translations,
    k,
    labels,
    image_size: Tuple[int, int],
    chunk: int = 64,
    backend: str = "xla",
    cull_backfaces: bool = False,
):
    """Depth map at a pose WITHOUT shading/normalization (e.g. the gt depth
    consumed by filter_flow_by_depth).  On the XLA path this rasterizes
    only (skips attribute interpolation + Phong — a fraction of the work);
    on the fused-Pallas path shading is baked into the one kernel and the
    full render IS the cheap path, so it reuses render_batch."""
    backend = resolve_backend(backend)
    h, w = image_size
    if backend == "pallas" and h % 8 == 0 and w % 128 == 0:
        out = render_batch(
            render_assets.verts, render_assets.faces,
            render_assets.face_valid, render_assets.colors,
            render_assets.normals, render_assets.vert_valid,
            rotations, translations, k, labels, h, w,
            chunk=chunk, backend=backend, cull_backfaces=cull_backfaces,
        )
        return out["depths"]
    from scflow_tpu.render.rasterizer import rasterize

    labels = labels.astype(jnp.int32)
    verts = jnp.take(render_assets.verts, labels, axis=0)
    faces = jnp.take(render_assets.faces, labels, axis=0)
    face_valid = jnp.take(render_assets.face_valid, labels, axis=0)
    verts_cam = (
        jnp.einsum("nij,nvj->nvi", rotations, verts) + translations[:, None]
    )
    return rasterize(verts_cam, faces, face_valid, k, h, w, chunk,
                     cull_backfaces=cull_backfaces).zbuf


def scflow_sequence_losses(
    out: Dict[str, jnp.ndarray],
    gt_rotations,
    gt_translations,
    gt_flow,
    rendered_masks,
    labels,
    assets: LossAssets,
    gamma: float = 0.8,
    pose_weight: float = 10.0,
    flow_weight: float = 0.1,
    mask_weight: float = 10.0,
    max_flow: float = 400.0,
    disentangle_z: bool = True,
    pose_loss_type: int = 1,
):
    """The 3-term exponentially-weighted sequence loss
    (scflow_refiner.py:212-247)."""
    T = out["rotations"].shape[0]
    # SIGNED component sum, not magnitude — faithful to the reference's
    # occlusion target (raft_refiner_flow_mask.py:193, shared by the scflow
    # mask loss); the val metric uses the magnitude (:258) and we mirror both
    gt_occ = (jnp.sum(gt_flow, axis=-1) < max_flow).astype(jnp.float32)

    log_vars: Dict[str, jnp.ndarray] = {}
    loss_pose = loss_flow = loss_mask = 0.0
    for i in range(T):
        wi = gamma ** (T - 1 - i)
        lp = disentangle_point_matching_loss(
            out["rotations"][i], out["translations"][i],
            gt_rotations, gt_translations, labels,
            assets.points, assets.valid, assets.sym, assets.diameters,
            loss_type=pose_loss_type, disentangle_z=disentangle_z,
            loss_weight=pose_weight,
        )
        lf = raft_loss(
            out["flow_from_pred"][i], gt_flow, valid=rendered_masks,
            max_flow=max_flow,
        ) * flow_weight
        lm = l1_loss(out["masks"][i], gt_occ) * mask_weight
        loss_pose += wi * lp
        loss_flow += wi * lf
        loss_mask += wi * lm
        log_vars[f"seq_{i}_pose_loss"] = lp
        log_vars[f"seq_{i}_flow_loss"] = lf
        log_vars[f"seq_{i}_mask_loss"] = lm

    loss = loss_pose + loss_flow + loss_mask
    log_vars.update(
        loss_pose=loss_pose, loss_flow=loss_flow, loss_mask=loss_mask, loss=loss
    )
    return loss, log_vars


def make_scflow_train_step(
    model,
    render_assets: RenderAssets,
    loss_assets: LossAssets,
    image_size: Tuple[int, int] = (256, 256),
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    max_flow: float = 400.0,
    filter_invalid_flow: bool = True,
    loss_kwargs: Optional[Dict[str, Any]] = None,
    render_chunk: int = 64,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "xla",
    donate: bool = True,
    render_augmentations: Optional[Any] = None,
    augment_seed: int = 0,
):
    """Returns jitted train_step(state, batch) -> (state, log_vars).

    batch keys (device arrays, batch axis 0): real_images (N,H,W,3)
    normalized, ref_rotations, ref_translations, gt_rotations,
    gt_translations, labels, k, gt_masks (N,H,W).

    render_augmentations: config list for on-device photometric augs of the
    rendered images (reference base_refiner.py:52-62, :159-160); randomness
    folds the step counter so training is deterministic and resume-exact.
    """
    loss_kwargs = dict(loss_kwargs or {})
    from scflow_tpu.models.augment import build_render_augmentation

    augment_fn = build_render_augmentation(render_augmentations)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rendered_images, rendered_depths, rendered_masks = render_and_normalize(
            render_assets,
            batch["ref_rotations"],
            batch["ref_translations"],
            batch["k"],
            batch["labels"],
            image_size,
            norm_mean,
            norm_std,
            chunk=render_chunk,
            backend=render_backend,
            cull_backfaces=render_cull_backfaces,
            augment_fn=augment_fn,
            augment_key=jax.random.fold_in(
                jax.random.PRNGKey(augment_seed), state.step
            ) if augment_fn is not None else None,
        )
        gt_flow = flow_from_pose_and_depth(
            batch["ref_rotations"], batch["ref_translations"],
            batch["gt_rotations"], batch["gt_translations"],
            rendered_depths, batch["k"], invalid_num=max_flow,
        )
        if filter_invalid_flow:
            gt_flow = filter_flow_by_mask(gt_flow, batch["gt_masks"], max_flow)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, updates = model.apply(
                variables,
                rendered_images,
                batch["real_images"],
                batch["ref_rotations"],
                batch["ref_translations"],
                rendered_depths,
                batch["k"],
                batch["labels"],
                train=True,
                lookup_backend=lookup_backend,
                mutable=mutable,
            )
            loss, log_vars = scflow_sequence_losses(
                out,
                batch["gt_rotations"],
                batch["gt_translations"],
                gt_flow,
                rendered_masks,
                batch["labels"],
                loss_assets,
                max_flow=max_flow,
                **loss_kwargs,
            )
            new_bs = updates.get("batch_stats") if mutable else None
            return loss, (log_vars, new_bs)

        (loss, (log_vars, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        log_vars["grad_norm"] = optax_global_norm(grads)
        return new_state, log_vars

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree):
    # not optax.global_norm: this upcasts every leaf to f32 first, so the
    # logged norm stays exact if a caller ever carries low-precision grads
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def make_raft_train_step(
    model,
    render_assets: RenderAssets,
    image_size: Tuple[int, int] = (256, 256),
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    max_flow: float = 400.0,
    filter_invalid_flow_by_mask: bool = True,
    filter_invalid_flow_by_depth: bool = False,
    gamma: float = 0.8,
    flow_weight: float = 1.0,
    occlusion_weight: float = 100.0,
    render_chunk: int = 64,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "xla",
    donate: bool = True,
    render_augmentations: Optional[Any] = None,
    augment_seed: int = 0,
):
    """Train step for the RAFT baseline refiners (flow [+ occlusion] losses;
    reference raft_refiner_flow_mask.py:169-222)."""
    from scflow_tpu.geometry.flow import filter_flow_by_depth
    from scflow_tpu.models.augment import build_render_augmentation

    augment_fn = build_render_augmentation(render_augmentations)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rendered_images, rendered_depths, rendered_masks = render_and_normalize(
            render_assets, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], image_size, norm_mean, norm_std,
            chunk=render_chunk, backend=render_backend,
            cull_backfaces=render_cull_backfaces,
            augment_fn=augment_fn,
            augment_key=jax.random.fold_in(
                jax.random.PRNGKey(augment_seed), state.step
            ) if augment_fn is not None else None,
        )
        gt_flow = flow_from_pose_and_depth(
            batch["ref_rotations"], batch["ref_translations"],
            batch["gt_rotations"], batch["gt_translations"],
            rendered_depths, batch["k"], invalid_num=max_flow,
        )
        if filter_invalid_flow_by_mask:
            gt_flow = filter_flow_by_mask(gt_flow, batch["gt_masks"], max_flow)
        if filter_invalid_flow_by_depth:
            gt_depths = render_depth(
                render_assets, batch["gt_rotations"], batch["gt_translations"],
                batch["k"], batch["labels"], image_size,
                chunk=render_chunk, backend=render_backend,
                cull_backfaces=render_cull_backfaces,
            )
            gt_flow = filter_flow_by_depth(gt_flow, gt_depths, rendered_depths, max_flow)
        # SIGNED component sum, not magnitude — faithful to the reference's
        # occlusion target (raft_refiner_flow_mask.py:193); its val metric
        # uses the magnitude instead (:258), and we mirror both sides
        gt_occ = (jnp.sum(gt_flow, axis=-1) < max_flow).astype(jnp.float32)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, updates = model.apply(
                variables, rendered_images, batch["real_images"], train=True,
                lookup_backend=lookup_backend, mutable=mutable,
            )
            T = out["flow"].shape[0]
            log_vars: Dict[str, jnp.ndarray] = {}
            loss_flow = loss_occ = 0.0
            for i in range(T):
                wi = gamma ** (T - 1 - i)
                lf = raft_loss(
                    out["flow"][i], gt_flow, valid=rendered_masks, max_flow=max_flow
                ) * flow_weight
                loss_flow += wi * lf
                log_vars[f"seq_{i}_flow_loss"] = lf
                if "occlusion" in out:
                    lo = l1_loss(out["occlusion"][i], gt_occ) * occlusion_weight
                    loss_occ += wi * lo
                    log_vars[f"seq_{i}_occ_loss"] = lo
            loss = loss_flow + loss_occ
            log_vars.update(loss_flow=loss_flow, loss=loss)
            if "occlusion" in out:
                log_vars["loss_occ"] = loss_occ
            new_bs = updates.get("batch_stats") if mutable else None
            return loss, (log_vars, new_bs)

        (loss, (log_vars, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        log_vars["grad_norm"] = optax_global_norm(grads)
        return new_state, log_vars

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_raft_infer_fn(
    model,
    render_assets: RenderAssets,
    image_size: Tuple[int, int] = (256, 256),
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    iters: Optional[int] = None,
    render_chunk: int = 64,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "auto",
    pnp_backend: str = "host",
    pnp_cfg: Optional[Dict[str, Any]] = None,
):
    """Inference for RAFT refiners: returns final flow (+occlusion) and the
    rendered depth the host PnP step consumes (flow_pose.solve_poses_from_flow).

    pnp_backend='device' (config `test_cfg.pnp_backend`) instead solves the
    pose INSIDE the jit with the batched RANSAC-DLT-GN solver
    (geometry/pnp.py + flow_pose.solve_poses_from_flow_device): the output
    then carries 'rotations'/'translations' directly and eval skips the
    per-object host cv2 loop (reference base_flow_refiner.py:99-155)."""
    pnp_cfg = dict(pnp_cfg or {})

    @jax.jit
    def infer(variables, batch):
        rendered_images, rendered_depths, rendered_masks = render_and_normalize(
            render_assets, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], image_size, norm_mean, norm_std,
            chunk=render_chunk, backend=render_backend,
            cull_backfaces=render_cull_backfaces,
        )
        out = model.apply(
            variables, rendered_images, batch["real_images"], iters=iters,
            train=False, lookup_backend=lookup_backend,
        )
        res = {
            "flow": out["flow"][-1],
            "rendered_depths": rendered_depths,
            "rendered_masks": rendered_masks,
        }
        if "occlusion" in out:
            res["occlusion"] = out["occlusion"][-1]
        if pnp_backend == "device":
            from scflow_tpu.refiners.flow_pose import \
                solve_poses_from_flow_device

            R, t, ok = solve_poses_from_flow_device(
                res["flow"], rendered_depths, batch["ref_rotations"],
                batch["ref_translations"], batch["k"],
                occlusion=res.get("occlusion"), **pnp_cfg,
            )
            res.update({"rotations": R, "translations": t, "pnp_ok": ok})
        return res

    return infer


def make_scflow_infer_fn(
    model,
    render_assets: RenderAssets,
    image_size: Tuple[int, int] = (256, 256),
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    iters: Optional[int] = None,
    render_chunk: int = 64,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "auto",
    unroll: bool = False,
    slim: bool = False,
):
    """Returns jitted infer(variables, batch) -> dict with final rotations /
    translations (patch-intrinsics frame; host code remaps to the original
    image, pose.py:264-309) plus final mask + flow panels.

    slim=True returns ONLY the final pose — the output surface of the
    reference's test-time forward (models/refiner/scflow_refiner.py:174-179,
    which returns pose/labels/scores and discards flow/mask).  This skips
    the final-iteration full-res flow/mask reconstructions AND the dense
    256² depth lift inside the decoder (pose_only mode), and shrinks the
    device->host fetch from ~1.3 MB/image to 48 B/image.  The eval path
    uses slim=True; TensorBoard panels and serving use slim=False.

    unroll=False (default) runs the decoder recurrence as lax.scan — measured
    faster end to end for inference than the unrolled loop (54.5 vs 61.2 ms
    at batch 16/256²/8 iters on v5e) and much faster to compile."""

    @partial(jax.jit, static_argnames=())
    def infer(variables, batch):
        rendered_images, rendered_depths, _ = render_and_normalize(
            render_assets,
            batch["ref_rotations"],
            batch["ref_translations"],
            batch["k"],
            batch["labels"],
            image_size,
            norm_mean,
            norm_std,
            chunk=render_chunk,
            backend=render_backend,
            cull_backfaces=render_cull_backfaces,
        )
        out = model.apply(
            variables,
            rendered_images,
            batch["real_images"],
            batch["ref_rotations"],
            batch["ref_translations"],
            rendered_depths,
            batch["k"],
            batch["labels"],
            iters=iters,
            train=False,
            output_sequences=False,
            unroll=unroll,
            lookup_backend=lookup_backend,
            pose_only=slim,
        )
        # no seq_* outputs: the model runs output_sequences=False here, so
        # only the final iteration exists (eval consumes just the final pose)
        res = {
            "rotations": out["rotations"][-1],
            "translations": out["translations"][-1],
        }
        if not slim:
            res["masks"] = out["masks"][-1]
            res["flow"] = out["flow_from_pred"][-1]
        return res

    return infer


def make_raft_val_step(
    model,
    render_assets: RenderAssets,
    image_size: Tuple[int, int] = (256, 256),
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    max_flow: float = 400.0,
    iters: Optional[int] = None,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "auto",
):
    """Validation metrics for the flow refiners (reference
    raft_refiner_flow_mask.py:241-283): flow EPE (+noc variant filtered by
    the gt mask) with {1,3,5}px accuracies and occlusion L1."""
    from scflow_tpu.geometry.flow import cal_epe

    @jax.jit
    def val_step(variables, batch):
        rendered_images, rendered_depths, rendered_masks = render_and_normalize(
            render_assets, batch["ref_rotations"], batch["ref_translations"],
            batch["k"], batch["labels"], image_size, norm_mean, norm_std,
            backend=render_backend,
            cull_backfaces=render_cull_backfaces,
        )
        out = model.apply(
            variables, rendered_images, batch["real_images"], iters=iters,
            train=False, lookup_backend=lookup_backend,
        )
        flow = out["flow"][-1]
        gt_flow = flow_from_pose_and_depth(
            batch["ref_rotations"], batch["ref_translations"],
            batch["gt_rotations"], batch["gt_translations"],
            rendered_depths, batch["k"], invalid_num=max_flow,
        )
        metrics = {}
        epe = cal_epe(gt_flow, flow, None, max_flow=max_flow,
                      reduction="total_mean")
        for k, v in epe.items():
            metrics[f"epe_{k}"] = v
        if "gt_masks" in batch:
            noc = filter_flow_by_mask(gt_flow, batch["gt_masks"], max_flow)
            epe_noc = cal_epe(noc, flow, None, max_flow=max_flow,
                              reduction="total_mean")
            for k, v in epe_noc.items():
                metrics[f"epe_noc_{k}"] = v
            occ_gt = (jnp.sqrt(jnp.sum(noc**2, axis=-1)) < max_flow).astype(
                jnp.float32
            )
        else:
            occ_gt = (jnp.sqrt(jnp.sum(gt_flow**2, axis=-1)) < max_flow).astype(
                jnp.float32
            )
        if "occlusion" in out:
            metrics["occ"] = jnp.abs(occ_gt - out["occlusion"][-1]).mean()
        return metrics

    return val_step


def make_scflow_cycled_infer_fn(
    model,
    render_assets: RenderAssets,
    cycles: int = 2,
    image_size: Tuple[int, int] = (256, 256),
    norm_mean=(0.0, 0.0, 0.0),
    norm_std=(255.0, 255.0, 255.0),
    iters: Optional[int] = None,
    render_chunk: int = 64,
    render_backend: str = "auto",
    render_cull_backfaces: bool = False,
    lookup_backend: str = "auto",
    unroll: bool = False,
    slim: bool = False,
):
    """Multi-pass refinement (reference forward_multiple_pass,
    base_refiner.py:249-260): after each cycle the object is re-rendered at
    the refined pose and refined again.  All cycles run in one jit.

    slim=True: pose-only output surface (see make_scflow_infer_fn) —
    intermediate cycles always run pose-only (their flow/mask are never
    consumed); slim only controls the LAST cycle's outputs."""

    @jax.jit
    def infer(variables, batch):
        R = batch["ref_rotations"]
        t = batch["ref_translations"]
        out = None
        for cycle in range(cycles):
            last = cycle == cycles - 1
            rendered_images, rendered_depths, _ = render_and_normalize(
                render_assets, R, t, batch["k"], batch["labels"],
                image_size, norm_mean, norm_std, chunk=render_chunk,
                backend=render_backend,
                cull_backfaces=render_cull_backfaces,
            )
            out = model.apply(
                variables, rendered_images, batch["real_images"], R, t,
                rendered_depths, batch["k"], batch["labels"], iters=iters,
                train=False, output_sequences=False, unroll=unroll,
                lookup_backend=lookup_backend,
                pose_only=slim or not last,
            )
            R = out["rotations"][-1]
            t = out["translations"][-1]
        res = {"rotations": R, "translations": t}
        if not slim:
            res["masks"] = out["masks"][-1]
            res["flow"] = out["flow_from_pred"][-1]
        return res

    return infer
