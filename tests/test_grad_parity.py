"""Gradient-level train-step parity vs the fp64 torch oracle.

Forward E2E parity (test_convert_torch.py) cannot see a stop_gradient in the
wrong place: the SCFlow recurrence detaches flow, mask AND the previous pose
every iteration (reference scflow_decoder.py:192-236), and the pose update
detaches vz for the xy terms (pose.py:142-144).  These tests run ONE train
step's loss+backward in both frameworks on shared synthetic inputs (render
replaced by shared arrays — no gradient flows through the renderer in the
reference either) and compare the loss value and every per-layer gradient
(rel error + cosine).  The torch side runs fp64, so it is the oracle;
disagreement beyond fp32 noise means a detach/structure bug.

Gradient layout note: torch grads convert through the SAME
convert_state_dict_to_variables used for weights — gradients transform
identically to parameters under the layout re-mapping (transpose/reshape are
linear), so a converted torch-grad tree is directly comparable leaf-by-leaf
to jax.grad's output.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from scflow_tpu.runtime.convert_torch import convert_state_dict_to_variables

from torch_oracle import (
    RAFTRefinerFlowMaskTorch,
    SCFlowRefinerTorch,
    raft_seq_loss_torch,
    scflow_loss_torch,
)


def to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def convert_grads(model_torch, template_variables):
    """Torch param grads -> flax params tree via the weight converter.
    Buffers (BN running stats) carry no grads; zeros keep the converter's
    strict key check satisfied."""
    grad_sd = {}
    for k, v in model_torch.state_dict().items():
        grad_sd[k] = np.zeros(v.shape, np.float64)
    for k, p in model_torch.named_parameters():
        if p.grad is not None:
            grad_sd[k] = p.grad.detach().numpy()
    conv = convert_state_dict_to_variables(
        grad_sd, jax.tree_util.tree_map(np.asarray, template_variables)
    )
    return conv["params"]


def compare_grad_trees(jax_grads, torch_grads, rel_tol, cos_tol):
    """Per-leaf relative L2 error + cosine similarity; returns the worst.

    Leaves whose oracle gradient is negligible against the GLOBAL gradient
    norm are checked for "jax is also negligible" and skipped from the
    rel/cos stats: conv biases feeding directly into IN/BN have an exactly
    zero mathematical gradient (normalization subtracts the mean), which is
    fp64 ~1e-16 on the oracle side but fp32 noise ~1e-6 on the jax side —
    a relative comparison there measures nothing but noise."""
    flat_j = jax.tree_util.tree_flatten_with_path(jax_grads)[0]
    flat_t = dict(
        (tuple(k.key for k in kp), leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(torch_grads)[0]
    )
    global_t = np.sqrt(sum(
        float(np.sum(np.asarray(v, np.float64) ** 2))
        for v in flat_t.values()))
    eps_abs = 1e-6 * global_t
    worst_rel, worst_cos, report = 0.0, 1.0, []
    for kp, gj in flat_j:
        path = tuple(k.key for k in kp)
        gt = np.asarray(flat_t[path], np.float64)
        gj = np.asarray(gj, np.float64)
        nj, nt = np.linalg.norm(gj), np.linalg.norm(gt)
        if nt < eps_abs:
            # oracle says (effectively) zero — jax must agree to fp32 noise
            assert nj < 1e3 * eps_abs, (
                f"{'/'.join(path)}: oracle grad ~0 ({nt:.2e}) but jax grad "
                f"{nj:.2e} (global norm {global_t:.2e})")
            continue
        rel = np.linalg.norm(gj - gt) / nt
        cos = float(np.sum(gj * gt) / (nj * nt + 1e-30))
        report.append((rel, cos, "/".join(path)))
        worst_rel = max(worst_rel, rel)
        worst_cos = min(worst_cos, cos)
    report.sort(reverse=True)
    print(f"grad parity: {len(report)} leaves, worst rel={worst_rel:.3e}, "
          f"worst cos={worst_cos:.8f}")
    msg = "\n".join(f"rel={r:.2e} cos={c:.6f} {p}" for r, c, p in report[:12])
    assert worst_rel < rel_tol and worst_cos > cos_tol, (
        f"worst rel={worst_rel:.3e} (tol {rel_tol}), "
        f"worst cos={worst_cos:.6f} (tol {cos_tol})\n{msg}"
    )
    return worst_rel, worst_cos


def make_shared_inputs(rng, n, img):
    from scipy.spatial.transform import Rotation

    real = rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.3
    render = rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.3
    depth = np.zeros((n, img, img), np.float32)
    yy, xx = np.mgrid[0:img, 0:img]
    blob = ((yy - img // 2) ** 2 + (xx - img // 2 + 4) ** 2) < (img // 4) ** 2
    depth[:, blob] = (400.0 + 0.3 * yy + 0.2 * xx)[blob]
    R = np.stack([Rotation.random(random_state=i).as_matrix()
                  for i in range(n)]).astype(np.float32)
    t = np.array([[5.0, -4.0, 400.0], [-6.0, 3.0, 420.0]], np.float32)[:n]
    # gt pose = ref pose perturbed a little (a realistic refinement target)
    dR = np.stack([Rotation.from_euler("xyz", [4 + 2 * i, -3, 2],
                                       degrees=True).as_matrix()
                   for i in range(n)]).astype(np.float32)
    gt_R = np.einsum("nij,njk->nik", dR, R).astype(np.float32)
    gt_t = t + np.array([[3.0, -2.0, 15.0], [-2.0, 4.0, -10.0]],
                        np.float32)[:n]
    K = np.tile(np.array([[[150.0, 0, img // 2], [0, 150.0, img // 2],
                           [0, 0, 1]]], np.float32), (n, 1, 1))
    gt_masks = (depth > 0).astype(np.float32)
    return real, render, depth, R, t, gt_R, gt_t, K, gt_masks


def make_vertex_banks(rng, nclass, counts, pad_to):
    """Per-class synthetic vertex clouds; class 1 symmetric (exercises the
    NN-matched branch both sides)."""
    meshes = [rng.normal(size=(c, 3)).astype(np.float32) * 40.0
              for c in counts]
    bank = np.zeros((nclass, pad_to, 3), np.float32)
    valid = np.zeros((nclass, pad_to), bool)
    for i, m in enumerate(meshes):
        bank[i, : len(m)] = m
        valid[i, : len(m)] = True
    diameters = np.array([120.0, 90.0, 150.0], np.float32)[:nclass]
    sym = np.zeros((nclass,), bool)
    sym[1] = True
    return meshes, bank, valid, sym, diameters


class TestSCFlowGradParity:
    def test_scflow_train_grad_parity(self, rng):
        """One SCFlow train-step loss+grad vs the fp64 oracle backward.
        Validates: the 3x detach structure of the recurrence, the
        detach_depth_for_xy stop-gradient, the gamma-weighted 3-term loss,
        and the shared-encoder double-use gradient accumulation."""
        from scflow_tpu.refiners import SCFlowRefiner
        from scflow_tpu.refiners.system import (LossAssets,
                                                scflow_sequence_losses)

        n, img, nclass, iters = 2, 128, 3, 3
        tm = SCFlowRefinerTorch(num_class=nclass, iters=iters,
                                feat_size=(img // 8, img // 8),
                                detach_depth_for_xy=True)
        with torch.no_grad():
            tm.decoder.pose_pred.rotation_pred.weight.normal_(0, 0.02)
            tm.decoder.pose_pred.translation_pred.weight.normal_(0, 0.02)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        fmodel = SCFlowRefiner(
            iters=iters, detach_depth_for_xy=True,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                               in_channels=224, rotation_mode="ortho6d"),
        )
        real, render, depth, R, t, gt_R, gt_t, K, gt_masks = \
            make_shared_inputs(rng, n, img)
        labels = np.array([0, 1])  # class 1 = symmetric
        meshes, bank, valid, sym, diameters = make_vertex_banks(
            rng, nclass, counts=(50, 64, 37), pad_to=64)

        # shared gt_flow, computed once (flow synthesis is forward-parity
        # tested elsewhere) and fed as a constant to BOTH losses
        from scflow_tpu.geometry.flow import (filter_flow_by_mask,
                                              flow_from_pose_and_depth)

        gt_flow_j = filter_flow_by_mask(
            flow_from_pose_and_depth(
                jnp.asarray(R), jnp.asarray(t), jnp.asarray(gt_R),
                jnp.asarray(gt_t), jnp.asarray(depth), jnp.asarray(K),
                invalid_num=400.0),
            jnp.asarray(gt_masks), 400.0)
        gt_flow = np.asarray(gt_flow_j)  # (N, H, W, 2)
        rendered_masks = (depth > 0).astype(np.float32)

        variables = fmodel.init(
            jax.random.PRNGKey(0), jnp.asarray(render), jnp.asarray(real),
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(depth),
            jnp.asarray(K), jnp.asarray(labels))
        conv = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables))
        assets = LossAssets(
            points=jnp.asarray(bank), valid=jnp.asarray(valid),
            sym=jnp.asarray(sym), diameters=jnp.asarray(diameters))

        batch_stats = conv.get("batch_stats")

        def loss_fn(params):
            vs = {"params": params}
            mutable = []
            if batch_stats is not None:
                vs["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            out, _ = fmodel.apply(
                vs, jnp.asarray(render), jnp.asarray(real), jnp.asarray(R),
                jnp.asarray(t), jnp.asarray(depth), jnp.asarray(K),
                jnp.asarray(labels), train=True, mutable=mutable)
            loss, _ = scflow_sequence_losses(
                out, jnp.asarray(gt_R), jnp.asarray(gt_t), gt_flow_j,
                jnp.asarray(rendered_masks), jnp.asarray(labels), assets,
                max_flow=400.0)
            return loss

        loss_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(conv["params"])

        tm = tm.double().train()
        out_t = tm(to_nchw(render).double(), to_nchw(real).double(),
                   torch.from_numpy(R).double(),
                   torch.from_numpy(t).double(),
                   torch.from_numpy(depth).double(),
                   torch.from_numpy(K).double(), torch.from_numpy(labels))
        loss_t = scflow_loss_torch(
            out_t, torch.from_numpy(gt_R).double(),
            torch.from_numpy(gt_t).double(),
            to_nchw(gt_flow).double(),
            torch.from_numpy(rendered_masks).double(),
            torch.from_numpy(labels),
            [torch.from_numpy(m).double() for m in meshes],
            diameters, sym_classes={1})
        loss_t.backward()

        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-4)
        grads_t = convert_grads(tm, variables)
        # fp32 forward+backward through a 3-iteration recurrence vs fp64:
        # tolerances documented in PARITY.md (gradient-parity section)
        compare_grad_trees(grads_j, grads_t, rel_tol=2e-2, cos_tol=0.9995)


class TestRAFTGradParity:
    def test_raft_train_grad_parity(self, rng):
        """RAFT-family train-step gradients vs the fp64 oracle: flow detach
        between iterations, shared convex-upsample mask reuse (flow x8 +
        occlusion x1), flow RAFT loss + occlusion L1."""
        from scflow_tpu.refiners import RAFTRefinerFlowMask

        n, img, iters = 2, 128, 3
        tm = RAFTRefinerFlowMaskTorch(iters=iters)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        fmodel = RAFTRefinerFlowMask(iters=iters)
        real, render, depth, R, t, gt_R, gt_t, K, gt_masks = \
            make_shared_inputs(rng, n, img)

        from scflow_tpu.geometry.flow import (filter_flow_by_mask,
                                              flow_from_pose_and_depth)

        gt_flow_j = filter_flow_by_mask(
            flow_from_pose_and_depth(
                jnp.asarray(R), jnp.asarray(t), jnp.asarray(gt_R),
                jnp.asarray(gt_t), jnp.asarray(depth), jnp.asarray(K),
                invalid_num=400.0),
            jnp.asarray(gt_masks), 400.0)
        gt_flow = np.asarray(gt_flow_j)
        rendered_masks = (depth > 0).astype(np.float32)

        variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(render),
                                jnp.asarray(real))
        conv = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables))
        batch_stats = conv.get("batch_stats")

        from scflow_tpu.losses.basic import l1_loss, raft_loss

        gamma, flow_w, occ_w = 0.8, 1.0, 100.0
        gt_occ_j = (jnp.sum(gt_flow_j, axis=-1) < 400.0).astype(jnp.float32)

        def loss_fn(params):
            vs = {"params": params}
            mutable = []
            if batch_stats is not None:
                vs["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            out, _ = fmodel.apply(vs, jnp.asarray(render), jnp.asarray(real),
                                  train=True, mutable=mutable)
            T = out["flow"].shape[0]
            loss = 0.0
            for i in range(T):
                w = gamma ** (T - 1 - i)
                loss += w * raft_loss(out["flow"][i], gt_flow_j,
                                      valid=jnp.asarray(rendered_masks),
                                      max_flow=400.0) * flow_w
                loss += w * l1_loss(out["occlusion"][i], gt_occ_j) * occ_w
            return loss

        loss_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(conv["params"])

        tm = tm.double().train()
        out_t = tm(to_nchw(render).double(), to_nchw(real).double())
        loss_t = raft_seq_loss_torch(
            out_t, to_nchw(gt_flow).double(),
            torch.from_numpy(rendered_masks).double(), gamma=gamma,
            flow_weight=flow_w, occlusion_weight=occ_w)
        loss_t.backward()

        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-4)
        grads_t = convert_grads(tm, variables)
        compare_grad_trees(grads_j, grads_t, rel_tol=2e-2, cos_tol=0.9995)
