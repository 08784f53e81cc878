"""AOT export (jax.export) roundtrip: artifact == live graph numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scflow_tpu.refiners import SCFlowRefiner
from scflow_tpu.refiners.system import RenderAssets, make_scflow_infer_fn
from scflow_tpu.render.meshbank import make_synthetic_bank
from scflow_tpu.runtime.export import (
    batch_spec,
    export_infer,
    load_exported,
    read_meta,
)


@pytest.fixture(scope="module")
def tiny_setup():
    img, nclass, n = 64, 2, 3
    bank = make_synthetic_bank(nclass, kind="cube", size=80.0, subdivisions=1)
    ra = RenderAssets.from_bank(bank)
    model = SCFlowRefiner(
        iters=2,
        pose_head_cfg=dict(
            type="MultiClassPoseHead", num_class=nclass, in_channels=224
        ),
    )
    rng = np.random.default_rng(3)
    from scipy.spatial.transform import Rotation

    R = Rotation.random(n, rng).as_matrix().astype(np.float32)
    t = np.stack(
        [rng.normal(size=n) * 5, rng.normal(size=n) * 5, rng.uniform(400, 500, n)],
        -1,
    ).astype(np.float32)
    K = np.tile(
        np.array([[[120.0, 0, img / 2], [0, 120.0, img / 2], [0, 0, 1]]],
                 np.float32),
        (n, 1, 1),
    )
    batch = {
        "real_images": rng.uniform(0, 255, (n, img, img, 3)).astype(np.float32),
        "ref_rotations": R,
        "ref_translations": t,
        "k": K,
        "labels": rng.integers(0, nclass, n).astype(np.int32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["real_images"], batch["real_images"],
        jnp.asarray(R), jnp.asarray(t), jnp.zeros((n, img, img)),
        jnp.asarray(K), jnp.asarray(batch["labels"]),
    )
    infer = make_scflow_infer_fn(model, ra, image_size=(img, img))
    return infer, variables, batch, img


def test_export_roundtrip_matches_live(tiny_setup, tmp_path):
    infer, variables, batch, img = tiny_setup
    n = batch["labels"].shape[0]
    spec = batch_spec(n, (img, img))
    data = export_infer(
        infer, variables, spec, platforms=("cpu",),
        meta={"config": "tiny-test", "iters": 2},
    )
    path = tmp_path / "model.scflowx"
    path.write_bytes(data)

    meta = read_meta(path.read_bytes())
    assert meta["platforms"] == ["cpu"]
    assert meta["inputs"]["real_images"]["shape"] == [n, img, img, 3]
    assert meta["config"] == "tiny-test"
    assert "rotations" in meta["outputs"]

    call, _ = load_exported(str(path))
    got = call({k: jnp.asarray(v) for k, v in batch.items()})
    want = infer(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    for k in ("rotations", "translations"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5
        )


def test_export_meta_rejects_garbage():
    with pytest.raises(ValueError, match="bad magic"):
        read_meta(b"NOTANARTIFACT" * 4)


def test_export_meta_rejects_truncated_and_corrupt():
    import struct

    # valid magic but nothing after it
    with pytest.raises(ValueError, match="truncated"):
        read_meta(b"SCFLOWX1")
    # magic + partial length word
    with pytest.raises(ValueError, match="truncated"):
        read_meta(b"SCFLOWX1" + b"\x04\x00")
    # meta_len claims more bytes than the file holds
    with pytest.raises(ValueError, match="exceeds file"):
        read_meta(b"SCFLOWX1" + struct.pack("<Q", 1 << 20) + b"{}")
    # length is right but the payload is not json
    bad = b"\xff\xfenot-json"
    with pytest.raises(ValueError, match="corrupt"):
        read_meta(b"SCFLOWX1" + struct.pack("<Q", len(bad)) + bad)


def test_export_meta_reserved_keys_win(tiny_setup):
    """Caller meta must not clobber the artifact's self-description."""
    infer, variables, batch, img = tiny_setup
    n = batch["labels"].shape[0]
    spec = batch_spec(n, (img, img))
    data = export_infer(
        infer, variables, spec, platforms=("cpu",),
        meta={"platforms": ["bogus"], "format": 999, "note": "kept"},
    )
    meta = read_meta(data)
    assert meta["platforms"] == ["cpu"]
    assert meta["format"] == 1
    assert meta["note"] == "kept"


def test_load_exported_rejects_platform_mismatch(tiny_setup, tmp_path):
    infer, variables, batch, img = tiny_setup
    n = batch["labels"].shape[0]
    spec = batch_spec(n, (img, img))
    data = export_infer(infer, variables, spec, platforms=("cpu",))
    # splice the header to claim a platform this backend is not
    meta = read_meta(data)
    import struct as _s
    import json as _j

    meta["platforms"] = ["tpu_v9"]
    payload = _j.dumps(meta).encode()
    (n0,) = _s.unpack_from("<Q", data, 8)
    spliced = b"SCFLOWX1" + _s.pack("<Q", len(payload)) + payload + data[16 + n0:]
    with pytest.raises(ValueError, match="tpu_v9"):
        load_exported(spliced)


def test_export_empty_platforms_falls_back_to_backend(tiny_setup):
    """`--platforms` with no values must behave like the default."""
    infer, variables, batch, img = tiny_setup
    n = batch["labels"].shape[0]
    spec = batch_spec(n, (img, img))
    data = export_infer(infer, variables, spec, platforms=())
    import jax as _jax

    assert read_meta(data)["platforms"] == [_jax.default_backend()]


@pytest.mark.slow
def test_export_cli_smoke(tmp_path):
    """export_main end to end: tiny config -> artifact -> load & call."""
    from tests.synthetic_bop import build_synthetic_bop

    build_synthetic_bop(tmp_path / "data", num_images=1, render_images=False)
    img = 64
    cfg_path = tmp_path / "tiny.py"
    cfg_path.write_text(f"""
model = dict(
    type="SCFlowRefiner",
    cxt_channels=128, h_channels=128, seperate_encoder=False, max_flow=400.0,
    encoder=dict(type="RAFTEncoder", in_channels=3, out_channels=256,
                 net_type="Basic", norm_cfg=dict(type="IN")),
    cxt_encoder=dict(type="RAFTEncoder", in_channels=3, out_channels=256,
                     net_type="Basic", norm_cfg=dict(type="BN")),
    decoder=dict(
        type="SCFlowDecoder", net_type="Basic", num_levels=4, radius=4,
        iters=2, detach_flow=True, detach_mask=True, detach_pose=True,
        detach_depth_for_xy=True, mask_flow=False, mask_corr=False,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=2,
                           in_channels=224, rotation_mode="ortho6d"),
        gru_type="SeqConv"),
    train_cfg=dict(),
    test_cfg=dict(iters=2),
    renderer=dict(mesh_dir=r"{tmp_path / 'data' / 'models_1024'}",
                  image_size=({img}, {img}),
                  shader_type="Phong", background_color=(0.5, 0.5, 0.5)),
)
""")
    out = tmp_path / "model.scflowx"
    from scflow_tpu.cli import export_main

    export_main([str(cfg_path), "--out", str(out), "--batch-size", "2",
                 "--platforms", "cpu"])
    call, meta = load_exported(str(out))
    assert meta["model_type"] == "SCFlowRefiner"
    n = 2
    rng = np.random.default_rng(0)
    batch = {
        "real_images": jnp.asarray(
            rng.uniform(0, 255, (n, img, img, 3)).astype(np.float32)),
        "ref_rotations": jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))),
        "ref_translations": jnp.asarray(
            np.tile(np.array([[0, 0, 450.0]], np.float32), (n, 1))),
        "k": jnp.asarray(np.tile(np.array(
            [[[120.0, 0, img / 2], [0, 120.0, img / 2], [0, 0, 1]]],
            np.float32), (n, 1, 1))),
        "labels": jnp.asarray(np.array([0, 1], np.int32)),
    }
    got = call(batch)
    assert np.isfinite(np.asarray(got["rotations"])).all()
    assert np.isfinite(np.asarray(got["translations"])).all()
