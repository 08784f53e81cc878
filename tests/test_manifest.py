"""State-dict manifest tests (runtime/manifest.py + converter wiring).

The manifest is transcribed from the reference module definitions; the
converter's expected-key set is generated from our flax param tree.  The
closure test proves the two independent derivations agree EXACTLY, so the
first real reference checkpoint either converts cleanly or fails with a
named key diff (MIGRATION.md 'State-dict manifest')."""

import numpy as np
import pytest

from scflow_tpu.runtime.convert_torch import (
    convert_state_dict_to_variables,
    duplicate_mmflow_encoder,
)
from scflow_tpu.runtime.manifest import (
    manifest_for_config,
    mmflow_raft_manifest,
    raft_refiner_manifest,
    scflow_refiner_manifest,
    synthetic_state_dict,
    verify_state_dict,
)


class RecordingDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return dict.__getitem__(self, k)


def _np_variables(variables):
    import jax

    return jax.tree_util.tree_map(np.asarray, variables)


@pytest.fixture(scope="module")
def scflow_variables():
    import jax
    import jax.numpy as jnp

    from scflow_tpu.refiners import SCFlowRefiner

    # seperate encoders so the template consumes BOTH serialized encoder
    # prefixes (the reference's shared instance serializes both paths with
    # identical tensors, base_refiner.py:36-39)
    model = SCFlowRefiner(
        iters=1, seperate_encoder=True,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=21,
                           in_channels=224, rotation_mode="ortho6d"),
    )
    n, s = 1, 256
    dummy = jnp.zeros((n, s, s, 3))
    R = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    t = jnp.tile(jnp.asarray([[0.0, 0.0, 700.0]]), (n, 1))
    K = jnp.tile(jnp.asarray(
        [[[500.0, 0, 128.0], [0, 500.0, 128.0], [0, 0, 1]]]), (n, 1, 1))
    return _np_variables(model.init(
        jax.random.PRNGKey(0), dummy, dummy, R, t,
        jnp.zeros((n, s, s)), K, jnp.zeros((n,), jnp.int32),
    ))


class TestManifestClosure:
    def test_scflow_manifest_converts_and_is_fully_consumed(
            self, scflow_variables):
        manifest = scflow_refiner_manifest()
        sd = RecordingDict(synthetic_state_dict(manifest))
        out = convert_state_dict_to_variables(
            sd, scflow_variables, strict=True)  # strict: no missing keys
        assert set(out) == set(scflow_variables)
        expected = {k for k in manifest
                    if not k.endswith("num_batches_tracked")}
        unconsumed = expected - sd.used
        assert not unconsumed, sorted(unconsumed)[:10]
        extra = sd.used - expected
        assert not extra, sorted(extra)[:10]

    def test_raft_manifest_converts_and_is_fully_consumed(self):
        import jax
        import jax.numpy as jnp

        from scflow_tpu.refiners import RAFTRefinerFlowMask

        model = RAFTRefinerFlowMask(iters=1, seperate_encoder=True)
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = _np_variables(
            model.init(jax.random.PRNGKey(0), dummy, dummy))
        manifest = raft_refiner_manifest()
        sd = RecordingDict(synthetic_state_dict(manifest))
        convert_state_dict_to_variables(sd, variables, strict=True)
        expected = {k for k in manifest
                    if not k.endswith("num_batches_tracked")}
        assert not (expected - sd.used), sorted(expected - sd.used)[:10]
        assert not (sd.used - expected), sorted(sd.used - expected)[:10]

    def test_mmflow_duplication_covers_encoder_surface(self):
        # mmflow ckpt -> duplicate -> must produce exactly the encoder
        # portion of the scflow manifest (decoder keys are foreign)
        sd = duplicate_mmflow_encoder(synthetic_state_dict(
            mmflow_raft_manifest()))
        scflow = scflow_refiner_manifest()
        enc_keys = {k for k in scflow if k.startswith(
            ("render_encoder.", "real_encoder.", "context."))}
        assert enc_keys == set(sd)

    def test_manifest_for_config_resolves(self):
        m = manifest_for_config(dict(
            type="SCFlowRefiner",
            decoder=dict(pose_head_cfg=dict(
                type="MultiClassPoseHead", num_class=21, in_channels=224,
                rotation_mode="ortho6d")),
        ))
        assert m == scflow_refiner_manifest()
        m2 = manifest_for_config(dict(
            type="RAFTRefinerFlowMask", decoder=dict(type="RAFTDecoderMask")))
        assert "decoder.occlusion_pred.predict_layer.weight" in m2
        assert manifest_for_config(dict(type="SomethingElse")) is None


class TestVerifyStateDict:
    def test_clean_pass(self):
        manifest = scflow_refiner_manifest()
        report = verify_state_dict(synthetic_state_dict(manifest), manifest)
        assert report == {"missing": [], "unexpected": [], "mismatched": []}

    def test_missing_key_named(self):
        manifest = scflow_refiner_manifest()
        sd = synthetic_state_dict(manifest)
        del sd["decoder.pose_pred.rotation_pred.weight"]
        with pytest.raises(ValueError, match="rotation_pred.weight"):
            verify_state_dict(sd, manifest)

    def test_shape_mismatch_named(self):
        manifest = scflow_refiner_manifest()
        sd = synthetic_state_dict(manifest)
        sd["context.conv1.weight"] = sd["context.conv1.weight"][:32]
        with pytest.raises(ValueError, match="context.conv1.weight"):
            verify_state_dict(sd, manifest)

    def test_unexpected_key_named_and_allowlist(self):
        manifest = mmflow_raft_manifest()
        sd = synthetic_state_dict(manifest)
        sd["decoder.foreign.weight"] = np.zeros((3, 3), np.float32)
        with pytest.raises(ValueError, match="decoder.foreign.weight"):
            verify_state_dict(sd, manifest)
        # the mmflow path allowlists decoder.* (foreign decoder rides along)
        report = verify_state_dict(
            sd, manifest, allow_unexpected_prefixes=("decoder.",))
        assert report["unexpected"] == []

    def test_old_torch_without_num_batches_tracked_passes(self):
        manifest = scflow_refiner_manifest()
        sd = {k: v for k, v in synthetic_state_dict(manifest).items()
              if not k.endswith("num_batches_tracked")}
        verify_state_dict(sd, manifest)


class TestConverterWiring:
    def test_convert_torch_checkpoint_manifest_rejects_bad_pth(
            self, tmp_path, scflow_variables):
        import torch

        manifest = scflow_refiner_manifest()
        sd = synthetic_state_dict(manifest)
        del sd["decoder.gru.conv_z.0.conv.weight"]
        path = tmp_path / "bad.pth"
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, str(path))
        from scflow_tpu.runtime.convert_torch import convert_torch_checkpoint

        with pytest.raises(ValueError, match="conv_z.0.conv.weight"):
            convert_torch_checkpoint(
                str(path), scflow_variables, strict=False, manifest=manifest)

    def test_convert_torch_checkpoint_manifest_accepts_good_pth(
            self, tmp_path, scflow_variables):
        import torch

        manifest = scflow_refiner_manifest()
        sd = synthetic_state_dict(manifest)
        path = tmp_path / "good.pth"
        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                                   for k, v in sd.items()}}, str(path))
        from scflow_tpu.runtime.convert_torch import convert_torch_checkpoint

        out = convert_torch_checkpoint(
            str(path), scflow_variables, strict=True, manifest=manifest)
        # spot-check a converted tensor round-trips (OIHW -> HWIO)
        got = out["params"]["decoder"]["update"]["gru"]["conv_z0"]["conv"][
            "kernel"]
        want = sd["decoder.gru.conv_z.0.conv.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(got, want)
