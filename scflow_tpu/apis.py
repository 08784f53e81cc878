"""High-level build APIs: config dict -> model / assets / train step /
infer fn / runner.  Used by tools/train.py and tools/test.py."""

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scflow_tpu.losses.point_matching import sym_mask_from_types
from scflow_tpu.refiners.flow_pose import solve_poses_from_flow
from scflow_tpu.refiners.system import (
    LossAssets,
    RenderAssets,
    make_raft_infer_fn,
    make_raft_train_step,
    make_scflow_infer_fn,
    make_scflow_train_step,
    render_and_normalize,
)
from scflow_tpu.render.meshbank import MeshBank
from scflow_tpu.runtime import convert_torch_checkpoint, load_params
from scflow_tpu.runtime.eval_loop import single_process_test
from scflow_tpu.utils.logging import get_logger


def build_render_assets(model_cfg: Dict) -> Tuple[RenderAssets, MeshBank]:
    from scflow_tpu.render.meshbank import resolve_cull_backfaces

    rcfg = model_cfg.get("renderer", {})
    bank = MeshBank.from_dir(rcfg["mesh_dir"])
    # cull_backfaces=True refuses to proceed on meshes that fail the
    # winding-safety check (a warning is too easy to miss for a silent
    # geometry-dropping failure); 'force' downgrades to a warning
    resolve_cull_backfaces(bank, rcfg.get("cull_backfaces"))
    return RenderAssets.from_bank(bank), bank


def build_loss_assets(model_cfg: Dict, num_class: int) -> Optional[LossAssets]:
    pcfg = model_cfg.get("pose_loss_cfg", {}).get("loss_func_cfg", {})
    mesh_path = pcfg.get("mesh_path")
    if mesh_path is None:
        return None
    bank = MeshBank.from_dir(mesh_path, diameters=pcfg.get("mesh_diameter"))
    return LossAssets(
        points=jnp.asarray(bank.verts),
        valid=jnp.asarray(bank.vert_valid),
        sym=sym_mask_from_types(pcfg.get("symmetry_types", {}), bank.num_class),
        diameters=jnp.asarray(bank.diameters),
    )


def norm_stats_from_cfg(cfg) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """(mean, std) of the Normalize transform in the test pipeline — the
    stats the checkpoint was trained/evaluated with.  Serving must use the
    same ones or every frame is normalized differently from training.
    Falls back to the reference's (0, 255) when no Normalize is found."""

    def scan(node):
        if isinstance(node, dict):
            if node.get("type") == "Normalize":
                return node
            for v in node.values():
                hit = scan(v)
                if hit is not None:
                    return hit
        elif isinstance(node, (list, tuple)):
            for v in node:
                hit = scan(v)
                if hit is not None:
                    return hit
        return None

    hit = scan(cfg.data.get("test", {})) or scan(cfg.data.get("train", {}))
    if hit is None:
        return (0.0, 0.0, 0.0), (255.0, 255.0, 255.0)
    return tuple(hit.get("mean", (0.0,) * 3)), tuple(hit.get("std", (255.0,) * 3))


def make_serving_from_cfg(cfg, model, render_assets):
    """Config-driven serving pipeline: returns (serve_fn, fetch_keys,
    post_fn) for `runtime.server.PoseService`.

    SCFlow outputs poses on-device (fetch pulls rotations/translations
    only); RAFT-family configs output flow (+occlusion) and post_fn runs
    the host PnP stage (reference test path, raft_refiner_flow.py:141-169)
    against the adapted intrinsics, so poses land in the original camera
    frame either way.  Used by `scflow-serve` and tools/warmup_cache.py.
    """
    from scflow_tpu.serving import make_raft_serving_fn, make_serving_fn

    norm_mean, norm_std = norm_stats_from_cfg(cfg)
    test_cfg = cfg.model.get("test_cfg", {})
    rcfg = cfg.model.get("renderer", {})
    image_size = tuple(rcfg.get("image_size", (256, 256)))
    common = dict(
        image_size=image_size[0], norm_mean=norm_mean, norm_std=norm_std,
        iters=test_cfg.get("iters"),
        render_cull_backfaces=bool(rcfg.get("cull_backfaces", False)),
    )
    banks = (render_assets.verts, render_assets.vert_valid)
    if cfg.model["type"] == "SCFlowRefiner":
        # the service fetches poses only, so run the model pose-only
        serve_fn = make_serving_fn(model, render_assets, *banks, slim=True,
                                   **common)
        return serve_fn, ("rotations", "translations"), None

    if test_cfg.get("pnp_backend", "host") == "device":
        # whole serve is one jit: pose solved in-graph (see
        # solve_poses_from_flow_device's planar-degeneracy note)
        pnp_cfg = dict(
            occ_thresh=test_cfg.get("occ_thresh", 0.5),
            reprojection_error=test_cfg.get("solve_pose_param", {}).get(
                "reprojectionerror", 3.0),
        )
        sp = test_cfg.get("sample_points")
        if sp and "num" in sp:
            pnp_cfg["num_points"] = sp["num"]
        if sp and sp.get("mode", "random") == "random":
            import warnings

            warnings.warn(
                "pnp_backend='device' always selects points by confidence "
                "top-k (occlusion when predicted, else a fixed "
                "pseudo-random score); sample_points mode='random' is not "
                "honored — use the host backend for reference-exact "
                "sampling semantics")
        serve_fn = make_raft_serving_fn(
            model, render_assets, *banks, pnp_backend="device",
            pnp_cfg=pnp_cfg, **common)
        return serve_fn, ("rotations", "translations"), None

    serve_fn = make_raft_serving_fn(model, render_assets, *banks, **common)
    fetch_keys = ("flow", "occlusion", "rendered_depths", "new_k",
                  "ref_rotations", "ref_translations")

    def post_fn(out):
        R, t, _ = solve_poses_from_flow(
            out["flow"], out["rendered_depths"], out["ref_rotations"],
            out["ref_translations"], out["new_k"],
            occlusion=out.get("occlusion"),
            occ_thresh=test_cfg.get("occ_thresh", 0.5),
            sample_points=test_cfg.get("sample_points"),
            reprojection_error=test_cfg.get("solve_pose_param", {}).get(
                "reprojectionerror", 3.0),
        )
        return {"rotations": R, "translations": t}

    return serve_fn, fetch_keys, post_fn


def init_model_variables(cfg, model, image_size=(256, 256), num_class=21,
                         seed: int = 0):
    h, w = image_size
    n = 2
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((n, h, w, 3))
    R = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    t = jnp.tile(jnp.asarray([[0.0, 0.0, 700.0]]), (n, 1))
    K = jnp.tile(jnp.asarray([[[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]]]), (n, 1, 1))
    labels = jnp.zeros((n,), jnp.int32)
    mtype = cfg["type"]
    if mtype == "SCFlowRefiner":
        return model.init(key, dummy, dummy, R, t, jnp.zeros((n, h, w)), K, labels)
    return model.init(key, dummy, dummy)


def load_init_weights(cfg_model, variables, logger=None):
    """Apply init_cfg Pretrained: torch .pth via the converter, or an orbax
    params dir."""
    logger = logger or get_logger("scflow_tpu")
    init_cfg = cfg_model.get("init_cfg") or {}
    path = init_cfg.get("checkpoint")
    if init_cfg.get("type") != "Pretrained" or not path:
        return variables
    if not os.path.exists(path):
        logger.warning(f"init checkpoint {path} not found; using random init")
        return variables
    if path.endswith((".pth", ".pt")):
        logger.info(f"Converting torch init checkpoint {path}")
        enc_norm = cfg_model.get("encoder", {}).get("norm_cfg", {}).get("type", "IN")
        cxt_norm = cfg_model.get("cxt_encoder", {}).get("norm_cfg", {}).get("type", "BN")
        return convert_torch_checkpoint(
            path, jax.tree_util.tree_map(np.asarray, variables),
            encoder_norm=enc_norm, cxt_norm=cxt_norm, strict=False,
        )
    logger.info(f"Loading orbax init params {path}")
    restored = load_params(path, jax.tree_util.tree_map(np.asarray, variables))
    return restored


def load_eval_checkpoint(path, variables, cfg_model=None, logger=None):
    """Load weights for testing (orbax params dir, orbax run dir, or torch)."""
    logger = logger or get_logger("scflow_tpu")
    if path.endswith((".pth", ".pt")):
        cfg_model = cfg_model or {}
        enc_norm = cfg_model.get("encoder", {}).get("norm_cfg", {}).get("type", "IN")
        cxt_norm = cfg_model.get("cxt_encoder", {}).get("norm_cfg", {}).get("type", "BN")
        # verify the real checkpoint against the transcribed reference
        # manifest first: a converter/naming mismatch fails loudly with a
        # named key diff instead of silently leaving leaves random
        from scflow_tpu.runtime.manifest import manifest_for_config

        manifest = manifest_for_config(cfg_model)
        return convert_torch_checkpoint(
            path, jax.tree_util.tree_map(np.asarray, variables),
            encoder_norm=enc_norm, cxt_norm=cxt_norm, strict=False,
            manifest=manifest,
        )
    template = {"params": jax.tree_util.tree_map(np.asarray, variables["params"])}
    if "batch_stats" in variables:
        template["batch_stats"] = jax.tree_util.tree_map(
            np.asarray, variables["batch_stats"]
        )
    restored = load_params(path, template)
    out = dict(variables)
    out["params"] = restored["params"]
    if "batch_stats" in restored:
        out["batch_stats"] = restored["batch_stats"]
    return out


def make_train_step_from_cfg(cfg, model, render_assets, loss_assets,
                             image_size=(256, 256)):
    mcfg = cfg.model
    mtype = mcfg["type"]
    # opt-in raster backface culling (renderer.cull_backfaces): safe only
    # for closed, consistently-wound meshes (all BOP scans); ~2x less
    # rasterizer coverage work, output unchanged
    cull = bool(mcfg.get("renderer", {}).get("cull_backfaces", False))
    if mtype == "SCFlowRefiner":
        pose_lf = mcfg.get("pose_loss_cfg", {}).get("loss_func_cfg", {})
        flow_lf = mcfg.get("flow_loss_cfg", {}).get("loss_func_cfg", {})
        mask_lf = mcfg.get("mask_loss_cfg", {}).get("loss_func_cfg", {})
        loss_kwargs = dict(
            gamma=mcfg.get("pose_loss_cfg", {}).get("gamma", 0.8),
            pose_weight=pose_lf.get("loss_weight", 10.0),
            flow_weight=flow_lf.get("loss_weight", 0.1),
            mask_weight=mask_lf.get("loss_weight", 10.0),
            disentangle_z=pose_lf.get("disentangle_z", True),
            pose_loss_type=int(pose_lf.get("loss_type", "l1")[-1]),
        )
        return make_scflow_train_step(
            model, render_assets, loss_assets, image_size=image_size,
            max_flow=mcfg.get("max_flow", 400.0),
            filter_invalid_flow=mcfg.get("filter_invalid_flow", True),
            loss_kwargs=loss_kwargs,
            render_augmentations=mcfg.get("render_augmentations"),
            render_cull_backfaces=cull,
        )
    flow_lf = mcfg.get("flow_loss_cfg", {}).get("loss_func_cfg", {})
    occ_lf = mcfg.get("occlusion_loss_cfg", {}).get("loss_func_cfg", {})
    return make_raft_train_step(
        model, render_assets, image_size=image_size,
        max_flow=mcfg.get("max_flow", 400.0),
        filter_invalid_flow_by_mask=mcfg.get("filter_invalid_flow_by_mask", True),
        filter_invalid_flow_by_depth=mcfg.get("filter_invalid_flow_by_depth", False),
        gamma=mcfg.get("flow_loss_cfg", {}).get("gamma", 0.8),
        flow_weight=flow_lf.get("loss_weight", 1.0),
        occlusion_weight=occ_lf.get("loss_weight", 100.0),
        render_augmentations=mcfg.get("render_augmentations"),
        render_cull_backfaces=cull,
    )


def make_infer_from_cfg(cfg, model, render_assets, image_size=(256, 256),
                        slim=False):
    """Returns (infer_fn, pose_from_output) for the eval loop.

    slim=True (SCFlow family only): pose-only output surface, matching the
    reference's test-time forward (scflow_refiner.py:174-179) — skips the
    full-res flow/mask reconstructions the eval loop never reads.  Callers
    that consume flow/mask panels (TensorBoard, export) keep slim=False."""
    mcfg = cfg.model
    test_cfg = mcfg.get("test_cfg", {})
    iters = test_cfg.get("iters")
    cull = bool(mcfg.get("renderer", {}).get("cull_backfaces", False))
    if mcfg["type"] == "SCFlowRefiner":
        cycles = test_cfg.get("cycles", 1)
        if cycles > 1:
            from scflow_tpu.refiners.system import make_scflow_cycled_infer_fn

            return (
                make_scflow_cycled_infer_fn(
                    model, render_assets, cycles=cycles,
                    image_size=image_size, iters=iters, slim=slim,
                    render_cull_backfaces=cull,
                ),
                None,
            )
        return (
            make_scflow_infer_fn(model, render_assets, image_size=image_size,
                                 iters=iters, slim=slim,
                                 render_cull_backfaces=cull),
            None,
        )
    if test_cfg.get("pnp_backend", "host") == "device":
        # TPU-native eval: batched RANSAC PnP inside the jit; the output
        # carries poses directly like the SCFlow path
        pnp_cfg = dict(
            occ_thresh=test_cfg.get("occ_thresh", 0.5),
            reprojection_error=test_cfg.get("solve_pose_param", {}).get(
                "reprojectionerror", 3.0),
        )
        sp = test_cfg.get("sample_points")
        if sp and "num" in sp:
            pnp_cfg["num_points"] = sp["num"]
        if sp and sp.get("mode", "random") == "random":
            import warnings

            warnings.warn(
                "pnp_backend='device' always selects points by confidence "
                "top-k (occlusion when predicted, else a fixed "
                "pseudo-random score); sample_points mode='random' is not "
                "honored — use the host backend for reference-exact "
                "sampling semantics")
        return (
            make_raft_infer_fn(model, render_assets, image_size=image_size,
                               iters=iters, pnp_backend="device",
                               pnp_cfg=pnp_cfg, render_cull_backfaces=cull),
            None,
        )
    infer = make_raft_infer_fn(model, render_assets, image_size=image_size,
                               iters=iters, render_cull_backfaces=cull)

    def pose_from_output(out, batch, n):
        R, t, ok = solve_poses_from_flow(
            np.asarray(out["flow"])[:n],
            np.asarray(out["rendered_depths"])[:n],
            np.asarray(batch["ref_rotations"])[:n],
            np.asarray(batch["ref_translations"])[:n],
            np.asarray(batch["k"])[:n],
            occlusion=np.asarray(out["occlusion"])[:n] if "occlusion" in out else None,
            occ_thresh=test_cfg.get("occ_thresh", 0.5),
            sample_points=test_cfg.get("sample_points"),
            reprojection_error=test_cfg.get("solve_pose_param", {}).get(
                "reprojectionerror", 3.0
            ),
        )
        return R, t

    return infer, pose_from_output


def build_eval_fn(cfg, model, render_assets, dataset, image_size=(256, 256)):
    """EvalHook callable: state -> flat metric dict."""
    infer, pose_from_output = make_infer_from_cfg(cfg, model, render_assets,
                                                  image_size, slim=True)
    metric = cfg.get("evaluation", {}).get(
        "metric", {"add": [0.05, 0.10, 0.20, 0.50]}
    )

    def eval_fn(state):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        results = single_process_test(
            variables, infer, dataset, pose_from_output=pose_from_output,
            progress_interval=0,
        )
        return dataset.evaluate(results, metric=metric)

    return eval_fn


def build_tb_image_fn(cfg, model, render_assets, image_size=(256, 256)):
    """TensorboardHook image_fn: renders flow/image/mask panels from the
    runner's last training batch (reference TensorboardImgLoggerHook protocol,
    models/utils/tensorboard_hook.py:27-60 + base_refiner.add_vis_images)."""
    from scflow_tpu.geometry.flow import flow_from_pose_and_depth
    from scflow_tpu.utils.visualize import flow2rgb, simple_forward_warp

    infer, _ = make_infer_from_cfg(cfg, model, render_assets, image_size)
    norm_mean = np.asarray(cfg.get("normalize_mean", [0.0, 0.0, 0.0]))
    norm_std = np.asarray(cfg.get("normalize_std", [255.0, 255.0, 255.0]))
    max_flow = cfg.model.get("max_flow", 400.0)

    def image_fn(runner):
        batch = runner.last_batch
        if batch is None:
            return {}
        variables = {"params": runner.state.params}
        if runner.state.batch_stats is not None:
            variables["batch_stats"] = runner.state.batch_stats
        out = jax.device_get(infer(variables, batch))
        imgs = {}
        real = np.asarray(jax.device_get(batch["real_images"][0]))
        imgs["train/real_image"] = np.clip(
            (real * norm_std + norm_mean) / 255.0, 0, 1
        )
        if "flow" in out:
            pred_flow = np.asarray(out["flow"][0])
            imgs["train/pred_flow"] = flow2rgb(pred_flow, unknown_thr=max_flow - 1)
        if "masks" in out:
            m = np.asarray(out["masks"][0])
            imgs["train/pred_mask"] = np.repeat(m[..., None], 3, axis=-1)
        if "flow" in out:
            # reference debug panel (base_refiner.py:356-362): the rendered
            # image forward-warped by the predicted flow should line up
            # with the real image when the flow is right
            rendered, _, rmasks = jax.device_get(render_and_normalize(
                render_assets, batch["ref_rotations"][:1],
                batch["ref_translations"][:1], batch["k"][:1],
                batch["labels"][:1], tuple(image_size),
                tuple(norm_mean), tuple(norm_std), chunk=1,
            ))
            rendered_disp = np.clip(
                (np.asarray(rendered[0]) * norm_std + norm_mean) / 255.0, 0, 1)
            imgs["train/warped_render"] = simple_forward_warp(
                rendered_disp, np.asarray(out["flow"][0]),
                np.asarray(rmasks[0]))
        if "gt_rotations" in batch:
            gt_flow = np.asarray(
                jax.device_get(
                    flow_from_pose_and_depth(
                        batch["ref_rotations"][:1], batch["ref_translations"][:1],
                        batch["gt_rotations"][:1], batch["gt_translations"][:1],
                        jnp.zeros((1,) + tuple(image_size)), batch["k"][:1],
                        invalid_num=max_flow,
                    )
                )
            )[0]
            imgs["train/gt_flow"] = flow2rgb(gt_flow, unknown_thr=max_flow - 1)
        return imgs

    return image_fn
