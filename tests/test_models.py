"""Model-layer tests: shapes, identity-at-init pose behavior, BN mutability,
checkpoint-relevant invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scflow_tpu.models import (
    ConvGRU,
    MotionEncoder,
    MultiClassPoseHead,
    RAFTEncoder,
    SCFlowDecoder,
    XHead,
)
from scflow_tpu.refiners import (
    RAFTRefinerFlowMask,
    SCFlowRefiner,
    build_refiner_from_config,
)


def param_count(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestEncoder:
    def test_output_shape_and_scale(self, key):
        enc = RAFTEncoder(norm="IN", out_channels=256)
        x = jnp.zeros((2, 64, 64, 3))
        v = enc.init(key, x)
        out = enc.apply(v, x)
        assert out.shape == (2, 8, 8, 256)

    def test_param_count_matches_torch_arch(self, key):
        """Torch RAFTEncoder-Basic (IN affine=False) parameter count:
        stem 7x7x3x64+64, 3 stages x 2 BasicBlocks (+1x1 downsample stage2/3),
        out conv 1x1x128x256+256."""
        enc = RAFTEncoder(norm="IN", out_channels=256)
        v = enc.init(key, jnp.zeros((1, 64, 64, 3)))

        def conv(cin, cout, k):
            return cin * cout * k * k + cout

        expect = conv(3, 64, 7)
        # stage1: 2 blocks 64->64
        expect += 2 * (conv(64, 64, 3) + conv(64, 64, 3))
        # stage2: block0 64->96 (+1x1 ds WITH bias, reference ResLayer
        # resnet.py:728), block1 96->96
        expect += conv(64, 96, 3) + conv(96, 96, 3) + conv(64, 96, 1)
        expect += conv(96, 96, 3) + conv(96, 96, 3)
        # stage3: block0 96->128 (+ds), block1 128->128
        expect += conv(96, 128, 3) + conv(128, 128, 3) + conv(96, 128, 1)
        expect += conv(128, 128, 3) + conv(128, 128, 3)
        expect += conv(128, 256, 1)
        assert param_count(v) == expect

    def test_bn_updates_batch_stats(self, key):
        enc = RAFTEncoder(norm="BN", out_channels=256)
        x = jnp.ones((2, 32, 32, 3))
        v = enc.init(key, x)
        assert "batch_stats" in v
        out, updates = enc.apply(v, x, True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestPoseHead:
    def test_identity_at_init(self, key):
        head = MultiClassPoseHead(num_class=4)
        x = jax.random.normal(key, (3, 32, 32, 224))
        label = jnp.array([0, 2, 3])
        v = head.init(key, x, label)
        rot, trans = head.apply(v, x, label)
        np.testing.assert_allclose(
            np.asarray(rot), np.tile([1, 0, 0, 0, 1, 0], (3, 1)), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(trans), np.zeros((3, 3)), atol=1e-6)

    def test_per_sample_gather(self, key):
        """Different labels must select different outputs (the reference's
        MultiClassPoseHead takes label[0] for the whole batch — fixed here,
        SURVEY.md §2.4 item 3)."""
        head = MultiClassPoseHead(num_class=4)
        x = jax.random.normal(key, (2, 32, 32, 224))
        v = head.init(key, x, jnp.array([0, 0]))
        # perturb the rotation head so classes differ
        p = jax.tree_util.tree_map(lambda a: a, v["params"])
        k = p["rotation_pred"]["kernel"]
        p["rotation_pred"]["kernel"] = jnp.ones_like(k) * 0.01
        # make class outputs distinct via bias
        b = p["rotation_pred"]["bias"]
        p["rotation_pred"]["bias"] = b + jnp.arange(b.shape[0]) * 0.1
        x_same = jnp.stack([x[0], x[0]])
        rot, _ = head.apply({"params": p}, x_same, jnp.array([1, 3]))
        assert not np.allclose(np.asarray(rot[0]), np.asarray(rot[1]))


def scene_inputs(n=2, H=64, W=64):
    depth = np.zeros((n, H, W), np.float32)
    depth[:, 16:48, 16:48] = 700.0
    K = np.tile(np.array([[[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]]], np.float32), (n, 1, 1))
    R = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    t = np.tile(np.array([[0, 0, 700.0]], np.float32), (n, 1))
    label = np.zeros((n,), np.int64)
    return jnp.asarray(depth), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), jnp.asarray(label)


class TestSCFlowRefiner:
    def test_forward_shapes_and_identity_start(self, key):
        n, H, W = 2, 64, 64
        model = SCFlowRefiner(
            iters=3,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=3, in_channels=224),
        )
        depth, K, R, t, label = scene_inputs(n, H, W)
        imgs = jax.random.normal(key, (n, H, W, 3)) * 0.1
        v = model.init(key, imgs, imgs, R, t, depth, K, label)
        out = model.apply(v, imgs, imgs, R, t, depth, K, label)
        assert out["flow_from_pose"].shape == (3, n, H, W, 2)
        assert out["rotations"].shape == (3, n, 3, 3)
        assert out["masks"].shape == (3, n, H, W)
        # pose head is zero-init -> first-iteration pose == ref pose
        np.testing.assert_allclose(np.asarray(out["rotations"][0]), np.asarray(R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["translations"][0]), np.asarray(t), rtol=1e-5)
        # and therefore pose-induced flow stays ~0 on valid pixels
        valid = np.asarray(depth) > 0
        assert np.abs(np.asarray(out["flow_from_pose"][0])[valid]).max() < 1e-2

    def test_shared_encoder_params(self, key):
        model = SCFlowRefiner(
            iters=1, seperate_encoder=False,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=2, in_channels=224),
        )
        depth, K, R, t, label = scene_inputs(2, 64, 64)
        imgs = jnp.zeros((2, 64, 64, 3))
        v = model.init(key, imgs, imgs, R, t, depth, K, label)
        assert "render_encoder" in v["params"] and "real_encoder" not in v["params"]

        model2 = SCFlowRefiner(
            iters=1, seperate_encoder=True,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=2, in_channels=224),
        )
        v2 = model2.init(key, imgs, imgs, R, t, depth, K, label)
        assert "real_encoder" in v2["params"]

    def test_gradients_reach_pose_head(self, key):
        n, H, W = 1, 64, 64
        model = SCFlowRefiner(
            iters=2,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=2, in_channels=224),
        )
        depth, K, R, t, label = scene_inputs(n, H, W)
        imgs = jax.random.normal(key, (n, H, W, 3)) * 0.1
        v = model.init(key, imgs, imgs, R, t, depth, K, label)

        def loss_fn(params):
            out = model.apply({**v, "params": params}, imgs, imgs, R, t, depth, K, label)
            return jnp.sum(out["translations"] ** 2) + jnp.sum(out["flow_from_pred"] ** 2)

        grads = jax.grad(loss_fn)(v["params"])
        # the final linears are zero-init, so at init the gradient signal
        # lands on them (not yet on the trunk convs behind the zero kernels)
        g = grads["decoder"]["update"]["pose_pred"]["translation_pred"]["kernel"]
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
        g_flow = grads["decoder"]["update"]["flow_pred"]["layer0"]["conv"]["kernel"]
        assert np.abs(np.asarray(g_flow)).max() > 0


class TestBuildFromConfig:
    def test_scflow_config_roundtrip(self):
        cfg = dict(
            type="SCFlowRefiner",
            cxt_channels=128,
            h_channels=128,
            seperate_encoder=False,
            max_flow=400.0,
            encoder=dict(type="RAFTEncoder", in_channels=3, out_channels=256,
                         net_type="Basic", norm_cfg=dict(type="IN")),
            cxt_encoder=dict(type="RAFTEncoder", in_channels=3, out_channels=256,
                             net_type="Basic", norm_cfg=dict(type="BN")),
            decoder=dict(
                type="SCFlowDecoder", net_type="Basic", num_levels=4, radius=4,
                iters=8, detach_flow=True, detach_mask=True, detach_pose=True,
                detach_depth_for_xy=True, mask_flow=False, mask_corr=False,
                pose_head_cfg=dict(type="MultiClassPoseHead", num_class=21,
                                   in_channels=224, rotation_mode="ortho6d"),
                gru_type="SeqConv",
            ),
        )
        model = build_refiner_from_config(cfg)
        assert isinstance(model, SCFlowRefiner)
        assert model.iters == 8 and model.detach_depth_for_xy is True
        assert model.pose_head_cfg["num_class"] == 21

    def test_raft_mask_forward(self, key):
        model = RAFTRefinerFlowMask(iters=2)
        imgs = jnp.zeros((1, 64, 64, 3))
        v = model.init(key, imgs, imgs)
        out = model.apply(v, imgs, imgs)
        assert out["flow"].shape == (2, 1, 64, 64, 2)
        assert out["occlusion"].shape == (2, 1, 64, 64)


class TestBF16:
    def test_bf16_inference_close_to_fp32(self, key):
        import jax.numpy as jnp

        n, H, W = 2, 64, 64
        depth, K, R, t, label = scene_inputs(n, H, W)
        imgs = jax.random.normal(key, (n, H, W, 3)) * 0.2
        kwargs = dict(
            iters=2,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=3, in_channels=224),
        )
        m32 = SCFlowRefiner(**kwargs)
        m16 = SCFlowRefiner(dtype=jnp.bfloat16, **kwargs)
        v = m32.init(key, imgs, imgs, R, t, depth, K, label)
        out32 = m32.apply(v, imgs, imgs, R, t, depth, K, label)
        out16 = m16.apply(v, imgs, imgs, R, t, depth, K, label)
        # params are shared; bf16 compute must stay close and emit fp32 poses
        assert out16["translations"].dtype == jnp.float32
        t32 = np.asarray(out32["translations"][-1])
        t16 = np.asarray(out16["translations"][-1])
        np.testing.assert_allclose(t16, t32, rtol=0.1, atol=2.0)
        R_err = np.abs(np.asarray(out16["rotations"][-1]) - np.asarray(out32["rotations"][-1]))
        assert R_err.max() < 0.05


class TestScanDecoder:
    def test_scan_matches_unroll(self, key):
        """unroll=False (nn.scan) shares the exact parameter tree with the
        unrolled loop and produces identical outputs and matching grads."""
        n, H, W = 2, 64, 64
        depth, K, R, t, label = scene_inputs(n, H, W)
        imgs = jax.random.normal(key, (n, H, W, 3)) * 0.1
        kw = dict(
            iters=3,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=3, in_channels=224),
        )
        m_un = SCFlowRefiner(unroll=True, **kw)
        m_sc = SCFlowRefiner(unroll=False, **kw)
        v = m_un.init(key, imgs, imgs, R, t, depth, K, label)
        v2 = m_sc.init(key, imgs, imgs, R, t, depth, K, label)
        paths1 = {
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(v["params"])[0]
        }
        paths2 = {
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(v2["params"])[0]
        }
        assert paths1 == paths2
        o1 = m_un.apply(v, imgs, imgs, R, t, depth, K, label)
        o2 = m_sc.apply(v, imgs, imgs, R, t, depth, K, label)
        for k in o1:
            np.testing.assert_allclose(
                np.asarray(o1[k]), np.asarray(o2[k]), atol=1e-5, err_msg=k
            )

        def loss(m, params):
            out = m.apply({**v, "params": params}, imgs, imgs, R, t, depth, K, label)
            return jnp.sum(out["translations"] ** 2) + jnp.sum(out["flow_from_pred"] ** 2)

        g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m_un, p))(v["params"]))
        g2 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m_sc, p))(v["params"]))
        # note: conv biases feeding InstanceNorm have analytically-zero
        # gradients; their values are fp32 cancellation noise that differs
        # with accumulation order, so compare against the global scale
        gnorm = np.sqrt(sum(float((np.asarray(a) ** 2).sum()) for a in g1))
        for a, b in zip(g1, g2):
            d = np.linalg.norm(np.asarray(a) - np.asarray(b))
            assert d < 1e-4 * gnorm + 1e-3, d


class TestScanUnrollFactor:
    def test_scan_unroll_factor_identical(self, key):
        """scan_unroll>1 only changes lax.scan's loop-body unroll factor —
        same param tree, bit-identical outputs (iters=3 with unroll=2
        exercises the remainder-step path)."""
        n, H, W = 2, 64, 64
        depth, K, R, t, label = scene_inputs(n, H, W)
        imgs = jax.random.normal(key, (n, H, W, 3)) * 0.1
        kw = dict(
            iters=3, unroll=False,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=3,
                               in_channels=224),
        )
        m1 = SCFlowRefiner(scan_unroll=1, **kw)
        m2 = SCFlowRefiner(scan_unroll=2, **kw)
        v = m1.init(key, imgs, imgs, R, t, depth, K, label)
        o1 = m1.apply(v, imgs, imgs, R, t, depth, K, label)
        o2 = m2.apply(v, imgs, imgs, R, t, depth, K, label)
        for k in o1:
            np.testing.assert_array_equal(
                np.asarray(o1[k]), np.asarray(o2[k]), err_msg=k
            )


class TestFusedGRUGates:
    def test_fused_gates_match_unfused(self, key):
        """gru_fuse_gates=True shares the exact parameter tree with the
        unfused ConvModules (conv_z{i}/conv, ...) and computes the same
        per-output-channel reductions — outputs must match to fp32
        accumulation noise, and init must produce an identical tree."""
        n, H, W = 2, 64, 64
        depth, K, R, t, label = scene_inputs(n, H, W)
        imgs = jax.random.normal(key, (n, H, W, 3)) * 0.1
        kw = dict(
            iters=3,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=3,
                               in_channels=224),
        )
        m0 = SCFlowRefiner(gru_fuse_gates=False, **kw)
        m1 = SCFlowRefiner(gru_fuse_gates=True, **kw)
        v = m0.init(key, imgs, imgs, R, t, depth, K, label)
        v1 = m1.init(key, imgs, imgs, R, t, depth, K, label)
        p0 = jax.tree_util.tree_structure(v)
        p1 = jax.tree_util.tree_structure(v1)
        assert p0 == p1, "fused param tree differs from unfused"
        for a, b in zip(jax.tree_util.tree_leaves(v),
                        jax.tree_util.tree_leaves(v1)):
            assert a.shape == b.shape

        o0 = m0.apply(v, imgs, imgs, R, t, depth, K, label)
        o1 = m1.apply(v, imgs, imgs, R, t, depth, K, label)
        for k in o0:
            np.testing.assert_allclose(
                np.asarray(o0[k]), np.asarray(o1[k]), atol=2e-5, err_msg=k
            )

        def loss(m, params):
            out = m.apply({**v, "params": params}, imgs, imgs, R, t, depth,
                          K, label)
            return (jnp.sum(out["translations"] ** 2)
                    + jnp.sum(out["flow_from_pred"] ** 2))

        g0 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m0, p))(v["params"]))
        g1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(m1, p))(v["params"]))
        gnorm = np.sqrt(sum(float((np.asarray(a) ** 2).sum()) for a in g0))
        for a, b in zip(g0, g1):
            d = np.linalg.norm(np.asarray(a) - np.asarray(b))
            assert d < 1e-4 * gnorm + 1e-3, d
