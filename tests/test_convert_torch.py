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
