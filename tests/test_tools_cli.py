"""Smoke tests for the offline tools (reference `tools/` parity surface:
collect_3d_keypoints, browse_dataset, visualize).  Each drives the real CLI
in a subprocess on a tiny synthetic BOP set, asserting the advertised
outputs exist — the reference has no tests at all for these (SURVEY §4),
so coverage here is exists+wellformed, not pixel golden files."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from synthetic_bop import build_synthetic_bop  # noqa: E402
from test_e2e_cli import CONFIG_TMPL  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def run(cmd, **env_extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.update(env_extra)
    return subprocess.run(
        cmd, cwd=str(REPO), env=env, capture_output=True, text=True, timeout=900
    )


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools")
    info = build_synthetic_bop(root / "data", num_images=2, render_images=True)
    cfg = root / "cfg.py"
    cfg.write_text(
        CONFIG_TMPL.format(
            root=str(root / "data"), diameters=info["diameters"],
            work_dir=str(root / "work"), model_type="SCFlowRefiner",
            decoder_type="SCFlowDecoder",
        )
    )
    return root, info


@pytest.mark.parametrize("mode", ["bbox", "obb", "fps"])
def test_collect_3d_keypoints_modes(workspace, mode):
    root, _ = workspace
    out = root / f"kp_{mode}.json"
    r = run([sys.executable, "tools/collect_3d_keypoints.py",
             str(root / "data" / "models_eval"), "--out", str(out),
             "--mode", mode, "--num", "8"])
    assert r.returncode == 0, r.stderr[-3000:]
    kp = json.loads(out.read_text())
    assert kp, "no keypoints written"
    entries = kp.values() if isinstance(kp, dict) else kp
    for v in entries:
        assert len(v) == 8 and len(v[0]) == 3


@pytest.mark.slow
def test_browse_dataset(workspace):
    root, _ = workspace
    out_dir = root / "browse"
    r = run([sys.executable, "tools/browse_dataset.py", str(root / "cfg.py"),
             "--split", "train", "--num", "2", "--out-dir", str(out_dir)])
    assert r.returncode == 0, r.stderr[-3000:]
    pngs = list(out_dir.rglob("*.png")) + list(out_dir.rglob("*.jpg"))
    assert pngs, f"no images written under {out_dir}"


@pytest.mark.slow
def test_browse_dataset_skip_types(workspace):
    root, _ = workspace
    out_dir = root / "browse_skip"
    r = run([sys.executable, "tools/browse_dataset.py", str(root / "cfg.py"),
             "--split", "train", "--num", "1", "--out-dir", str(out_dir),
             "--skip-types", "PoseJitter"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert list(out_dir.rglob("*.png")) + list(out_dir.rglob("*.jpg"))


@pytest.mark.slow
def test_visualize_with_trained_checkpoint(workspace):
    root, _ = workspace
    r = run([sys.executable, "tools/train.py", str(root / "cfg.py"),
             "--work-dir", str(root / "work"), "--max-iters", "1"])
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = root / "work" / "checkpoints" / "1"
    assert ckpt.exists(), "no checkpoint after 1-iter train"
    out_dir = root / "vis"
    r2 = run([sys.executable, "tools/visualize.py", str(root / "cfg.py"),
              "--checkpoint", str(ckpt), "--num", "2",
              "--out-dir", str(out_dir)])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert list(out_dir.rglob("*.png")) + list(out_dir.rglob("*.jpg")), \
        f"no overlays written under {out_dir}"
