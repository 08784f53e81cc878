"""Checkpoint-conversion + layer-parity tests: torch oracle modules (mmcv
naming) -> convert -> flax modules must produce matching outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from scflow_tpu.models import (
    ConvGRU,
    MotionEncoder,
    MultiClassPoseHead,
    RAFTEncoder,
    XHead,
)
from scflow_tpu.runtime.convert_torch import (
    convert_state_dict_to_variables,
    duplicate_mmflow_encoder,
)

from torch_oracle import (
    ConvGRUTorch,
    MotionEncoderTorch,
    MultiClassPoseHeadTorch,
    RAFTEncoderTorch,
    SCFlowRefinerTorch,
    XHeadTorch,
)


def to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestEncoderConversion:
    @pytest.mark.parametrize("norm", ["IN", "BN"])
    def test_encoder_forward_parity(self, key, norm, rng):
        tmodel = RAFTEncoderTorch(out_channels=256, norm=norm).eval()
        fmodel = RAFTEncoder(norm=norm, out_channels=256)
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        variables = fmodel.init(key, jnp.asarray(x))
        sd = prefix_sd(tmodel, "render_encoder")
        converted = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables),
            encoder_norm=norm, cxt_norm=norm, root="render_encoder",
        )
        out_f = fmodel.apply(
            {k: converted[k] for k in variables}, jnp.asarray(x)
        )
        with torch.no_grad():
            out_t = to_nhwc(tmodel(to_nchw(x)))
        np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4)

    @pytest.mark.parametrize(
        "depth,v1d,size",
        [(18, False, 64), (50, True, 64), (50, True, 70)],
    )
    def test_full_resnet_parity(self, key, rng, depth, v1d, size):
        """Full ResNet/ResNetV1d backbone (reference resnet.py:306-773):
        converted torch weights reproduce all four stage outputs, incl. the
        bias=True downsample projection and the V1d deep-stem/avg-down
        layout.  size=70 drives odd feature maps through the stride-2
        stages, exercising the avg-down ceil_mode=True emulation (the
        reference pools with ceil_mode=True + count_include_pad=False,
        resnet.py:716-720)."""
        from scflow_tpu.models.resnet import ResNet, ResNetV1d
        from torch_oracle import ResNetTorch

        tm = ResNetTorch(depth=depth, deep_stem=v1d, avg_down=v1d).eval()
        fcls = ResNetV1d if v1d else ResNet
        fm = fcls(depth=depth)
        x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
        variables = fm.init(key, jnp.asarray(x))
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        conv = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables),
            encoder_norm="BN", cxt_norm="BN",
        )
        outs_f = fm.apply({k: conv[k] for k in variables}, jnp.asarray(x))
        with torch.no_grad():
            outs_t = tm(to_nchw(x))
        assert len(outs_f) == 4
        for of, ot in zip(outs_f, outs_t):
            np.testing.assert_allclose(
                np.asarray(of), to_nhwc(ot), atol=5e-4
            )

    def test_mmflow_duplication_rule(self):
        sd = {"encoder.conv1.weight": np.zeros(1), "cxt_encoder.conv1.weight": np.ones(1),
              "decoder.gru.conv_z.0.conv.weight": np.ones(2)}
        out = duplicate_mmflow_encoder(sd)
        assert "real_encoder.conv1.weight" in out
        assert "render_encoder.conv1.weight" in out
        assert "context.conv1.weight" in out
        assert "decoder.gru.conv_z.0.conv.weight" in out


class TestDecoderPieces:
    def test_motion_encoder_parity(self, key, rng):
        tm = MotionEncoderTorch().eval()
        fm = MotionEncoder()
        corr = rng.normal(size=(2, 8, 8, 324)).astype(np.float32)
        flow = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
        variables = fm.init(key, jnp.asarray(corr), jnp.asarray(flow))
        sd = prefix_sd(tm, "decoder.encoder")
        conv = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables), root="decoder.encoder"
        )
        out_f = fm.apply(conv, jnp.asarray(corr), jnp.asarray(flow))
        with torch.no_grad():
            out_t = to_nhwc(tm(to_nchw(corr), to_nchw(flow)))
        np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4)

    def test_gru_parity(self, key, rng):
        tm = ConvGRUTorch().eval()
        fm = ConvGRU(128)
        h = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
        x = rng.normal(size=(2, 8, 8, 256)).astype(np.float32)
        variables = fm.init(key, jnp.asarray(h), jnp.asarray(x))
        conv = convert_state_dict_to_variables(
            prefix_sd(tm, "gru"), jax.tree_util.tree_map(np.asarray, variables),
            root="gru",
        )
        out_f = fm.apply(conv, jnp.asarray(h), jnp.asarray(x))
        with torch.no_grad():
            out_t = to_nhwc(tm(to_nchw(h), to_nchw(x)))
        np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4)

    def test_xhead_parity(self, key, rng):
        tm = XHeadTorch(kind="flow").eval()
        fm = XHead((256,), 2, kind="flow")
        x = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
        variables = fm.init(key, jnp.asarray(x))
        conv = convert_state_dict_to_variables(
            prefix_sd(tm, "flow_pred"), jax.tree_util.tree_map(np.asarray, variables),
            root="flow_pred",
        )
        out_f = fm.apply(conv, jnp.asarray(x))
        with torch.no_grad():
            out_t = to_nhwc(tm(to_nchw(x)))
        np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4)

    def test_full_model_e2e_parity(self, key, rng):
        """Whole-network fp32 parity: torch oracle SCFlowRefiner (fp64) ->
        convert state dict -> flax SCFlowRefiner forward.  Covers the full
        chain the layer tests cannot: shared-encoder feature extraction,
        corr pyramid + windowed lookup, 4 recurrent GRU iterations, SE(3)
        updates, and the pose-induced flow feedback (VERDICT r1 item 3)."""
        from scflow_tpu.refiners import SCFlowRefiner

        # img=128 is the floor for a 4-level pyramid: 64px features are 8x8
        # and the last level collapses to 1x1 (align_corners grid div-by-0)
        n, img, nclass, iters = 2, 128, 3, 4
        tm = SCFlowRefinerTorch(num_class=nclass, iters=iters,
                                feat_size=(img // 8, img // 8)).eval()
        # non-zero pose head so the pose chain (and its feedback into the
        # next lookup) actually moves
        with torch.no_grad():
            tm.decoder.pose_pred.rotation_pred.weight.normal_(0, 0.02)
            tm.decoder.pose_pred.translation_pred.weight.normal_(0, 0.02)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        fmodel = SCFlowRefiner(
            iters=iters,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                               in_channels=224, rotation_mode="ortho6d"),
        )
        real = rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.3
        render = rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.3
        depth = np.zeros((n, img, img), np.float32)
        yy, xx = np.mgrid[0:img, 0:img]
        blob = ((yy - 64) ** 2 + (xx - 60) ** 2) < 36**2
        depth[:, blob] = (400.0 + 0.3 * yy + 0.2 * xx)[blob]
        from scipy.spatial.transform import Rotation

        R = np.stack([Rotation.random(random_state=i).as_matrix()
                      for i in range(n)]).astype(np.float32)
        t = np.array([[5.0, -4.0, 400.0], [-6.0, 3.0, 420.0]], np.float32)
        K = np.tile(np.array([[[150.0, 0, 64], [0, 150.0, 64], [0, 0, 1]]],
                             np.float32), (n, 1, 1))
        labels = np.array([0, 2])

        variables = fmodel.init(
            key, jnp.asarray(render), jnp.asarray(real), jnp.asarray(R),
            jnp.asarray(t), jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray(labels),
        )
        conv = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables)
        )
        out_f = fmodel.apply(
            {k: conv[k] for k in variables}, jnp.asarray(render),
            jnp.asarray(real), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(depth), jnp.asarray(K), jnp.asarray(labels),
        )
        tm = tm.double()
        with torch.no_grad():
            out_t = tm(
                to_nchw(render).double(), to_nchw(real).double(),
                torch.from_numpy(R).double(), torch.from_numpy(t).double(),
                torch.from_numpy(depth).double(),
                torch.from_numpy(K).double(),
                torch.from_numpy(labels),
            )

        # full sequences, every iteration
        np.testing.assert_allclose(
            np.asarray(out_f["rotations"]), out_t["rotations"].numpy(),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_f["translations"]),
            out_t["translations"].numpy(), rtol=2e-3, atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(out_f["delta_rotations"]),
            out_t["delta_rotations"].numpy(), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_f["masks"]),
            out_t["masks"].numpy()[:, :, 0], atol=2e-3,
        )
        f_pred = np.asarray(out_f["flow_from_pred"]).transpose(0, 1, 4, 2, 3)
        np.testing.assert_allclose(
            f_pred, out_t["flow_from_pred"].numpy(), atol=5e-3,
        )
        f_pose = np.asarray(out_f["flow_from_pose"]).transpose(0, 1, 4, 2, 3)
        np.testing.assert_allclose(
            f_pose, out_t["flow_from_pose"].numpy(), atol=2e-2,
        )

    def test_pose_head_parity(self, key, rng):
        """Covers the NCHW-flatten ordering of the FC input — the subtle
        conversion hazard (SURVEY.md §7.4 item 5)."""
        tm = MultiClassPoseHeadTorch(num_class=4).eval()
        fm = MultiClassPoseHead(num_class=4)
        # non-zero weights so the test is meaningful
        with torch.no_grad():
            for p in tm.parameters():
                p.normal_(0, 0.05)
        x = rng.normal(size=(3, 32, 32, 224)).astype(np.float32)
        label = np.array([0, 2, 3])
        variables = fm.init(key, jnp.asarray(x), jnp.asarray(label))
        conv = convert_state_dict_to_variables(
            prefix_sd(tm, "pose_pred"), jax.tree_util.tree_map(np.asarray, variables),
            root="pose_pred",
        )
        rot_f, trans_f = fm.apply(conv, jnp.asarray(x), jnp.asarray(label))
        with torch.no_grad():
            rot_t, trans_t = tm(to_nchw(x), torch.from_numpy(label))
        np.testing.assert_allclose(np.asarray(rot_f), rot_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(trans_f), trans_t.numpy(), atol=2e-4)


class TestRAFTFamilyE2E:
    def test_full_raft_e2e_parity(self, key):
        """Whole-network fp32 parity for the SECOND model family:
        torch-oracle RAFTRefinerFlowMask (fp64) -> convert state dict ->
        flax RAFTRefinerFlowMask forward.  Covers what the layer tests
        cannot: the iteration loop composition (flow detach, delta
        accumulation), the shared 0.25-scaled convex-upsample mask applied
        to both flow (x8) and sigmoid occlusion (x1), and the tanh/relu
        context split."""
        from torch_oracle import RAFTRefinerFlowMaskTorch

        from scflow_tpu.refiners import RAFTRefinerFlowMask

        rng = np.random.default_rng(7)
        n, img, iters = 2, 128, 3
        tm = RAFTRefinerFlowMaskTorch(iters=iters).eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        fmodel = RAFTRefinerFlowMask(iters=iters)
        real = rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.3
        render = rng.normal(size=(n, img, img, 3)).astype(np.float32) * 0.3

        variables = fmodel.init(key, jnp.asarray(render), jnp.asarray(real))
        conv = convert_state_dict_to_variables(
            sd, jax.tree_util.tree_map(np.asarray, variables)
        )
        out_f = fmodel.apply(
            {k: conv[k] for k in variables}, jnp.asarray(render),
            jnp.asarray(real),
        )

        tm = tm.double()
        with torch.no_grad():
            out_t = tm(to_nchw(render).double(), to_nchw(real).double())

        flow_f = np.asarray(out_f["flow"]).transpose(0, 1, 4, 2, 3)
        np.testing.assert_allclose(
            flow_f, out_t["flow"].numpy(), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out_f["occlusion"]), out_t["occlusion"].numpy(),
            atol=2e-3)
