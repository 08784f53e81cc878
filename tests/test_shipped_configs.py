"""Smoke the shipped configs (configs/refine_models + refine_datasets):
parse with _base_ inheritance, build the model, trace its init (no
compile), and resolve every pipeline/dataset registry name.

The reference ships configs that crash on use (`--out` undefined,
MultiSourceSampler missing — SURVEY.md §2.4); these tests pin that OUR
shipped configs at least construct.  Data-dependent pieces (mesh dirs,
image lists) are NOT touched — only structure and registry resolution.
"""

import os

import jax
import jax.numpy as jnp
import pytest

import scflow_tpu.datasets  # noqa: F401  (populates DATASETS/PIPELINES)
import scflow_tpu.datasets.pipelines  # noqa: F401
from scflow_tpu.config import Config
from scflow_tpu.refiners import build_refiner_from_config
from scflow_tpu.registry import DATASETS, PIPELINES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL_CFGS = ["scflow.py", "raft.py"]
DATASET_CFGS = ["ycbv_real.py", "ycbv_pbr.py", "ycbv_mixpbr.py",
                "ycbv_mix20real.py"]


def walk_pipelines(node, found):
    if isinstance(node, dict):
        if "pipeline" in node:
            for t in node["pipeline"]:
                found.append(t["type"])
                walk_pipelines(t, found)
        for k, v in node.items():
            if k != "pipeline":
                walk_pipelines(v, found)
    elif isinstance(node, (list, tuple)):
        for v in node:
            walk_pipelines(v, found)


def walk_dataset_types(node, found):
    if isinstance(node, dict):
        if "type" in node and node.get("type") in DATASETS:
            found.append(node["type"])
        for v in node.values():
            walk_dataset_types(v, found)
    elif isinstance(node, (list, tuple)):
        for v in node:
            walk_dataset_types(v, found)


@pytest.mark.parametrize("name", MODEL_CFGS)
class TestModelConfigs:
    def cfg(self, name):
        return Config.fromfile(
            os.path.join(REPO, "configs", "refine_models", name))

    def test_parses_and_model_builds(self, name):
        cfg = self.cfg(name)
        model = build_refiner_from_config(cfg.model)
        assert model is not None
        # every pipeline transform type must resolve in the registry
        types = []
        walk_pipelines(cfg.data, types)
        assert types, "no pipeline found in merged config"
        unknown = [t for t in types if t not in PIPELINES]
        assert not unknown, f"unregistered pipeline types: {unknown}"

    def test_model_init_traces(self, name):
        """eval_shape runs the full network wiring without compiling."""
        cfg = self.cfg(name)
        model = build_refiner_from_config(cfg.model)
        n, h, w = 1, 64, 64
        key = jax.random.PRNGKey(0)
        dummy = jnp.zeros((n, h, w, 3))
        if cfg.model["type"] == "SCFlowRefiner":
            R = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
            t = jnp.asarray([[0.0, 0.0, 700.0]])
            K = jnp.asarray([[[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]]])
            labels = jnp.zeros((n,), jnp.int32)
            shapes = jax.eval_shape(
                model.init, key, dummy, dummy, R, t,
                jnp.zeros((n, h, w)), K, labels)
        else:
            shapes = jax.eval_shape(model.init, key, dummy, dummy)
        assert "params" in shapes

    def test_eval_and_runner_sections(self, name):
        cfg = self.cfg(name)
        assert cfg.runner["max_iters"] > 0
        assert "optimizer" in cfg
        metric = cfg.get("evaluation", {}).get("metric")
        assert metric, "evaluation.metric missing"


def test_shipped_cull_backfaces_end_to_end(tmp_path):
    """The shipped configs enable renderer.cull_backfaces; the asset
    builder must run the winding-safety check on the real mesh files and
    the infer builder must pick the flag up — and an unsafe bank on disk
    must refuse loudly instead of silently dropping geometry."""
    from scflow_tpu.apis import build_render_assets, make_infer_from_cfg
    from scflow_tpu.refiners import build_refiner_from_config
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from tests.synthetic_bop import write_ply

    cfg = Config.fromfile(
        os.path.join(REPO, "configs", "refine_models", "scflow.py"))
    assert cfg.model["renderer"]["cull_backfaces"] is True

    bank = make_synthetic_bank(1, kind="uvsphere", size=60.0)
    v = bank.verts[0][bank.vert_valid[0]]
    f = bank.faces[0][bank.face_valid[0]]
    good, bad = tmp_path / "good", tmp_path / "bad"
    good.mkdir(), bad.mkdir()
    write_ply(good / "obj_000001.ply", v, f, bank.colors[0][: len(v)])
    write_ply(bad / "obj_000001.ply", v, f[:, ::-1],  # inward winding
              bank.colors[0][: len(v)])

    cfg.model["renderer"]["mesh_dir"] = str(good)
    render_assets, _ = build_render_assets(cfg.model)
    infer, _ = make_infer_from_cfg(cfg, build_refiner_from_config(cfg.model),
                                   render_assets, image_size=(64, 64),
                                   slim=True)
    assert infer is not None  # built with cull resolved True

    cfg.model["renderer"]["mesh_dir"] = str(bad)
    with pytest.raises(ValueError, match="cull_backfaces"):
        build_render_assets(cfg.model)
    # 'force' override: warn-and-proceed
    cfg.model["renderer"]["cull_backfaces"] = "force"
    import warnings

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        build_render_assets(cfg.model)
    assert any("cull_backfaces" in str(w.message) for w in rec)


@pytest.mark.parametrize("name", DATASET_CFGS)
def test_dataset_config_parses(name):
    cfg = Config.fromfile(
        os.path.join(REPO, "configs", "refine_datasets", name))
    for split in ("train", "val", "test"):
        assert split in cfg.data, f"missing data.{split}"
    found = []
    walk_dataset_types(cfg.data, found)
    assert found, "no registered dataset type found"
    types = []
    walk_pipelines(cfg.data, types)
    unknown = [t for t in types if t not in PIPELINES]
    assert not unknown, f"unregistered pipeline types: {unknown}"
