"""Native + fallback BOP annotation store tests."""

import json

import numpy as np
import pytest

from scflow_tpu.datasets import bop_store


@pytest.fixture
def bop_jsons(tmp_path, rng):
    gt, cam, info = {}, {}, {}
    for img in range(4):
        gt[str(img)] = [
            dict(
                cam_R_m2c=rng.normal(size=9).tolist(),
                cam_t_m2c=rng.normal(size=3).tolist(),
                obj_id=int(rng.integers(1, 22)),
            )
            for _ in range(img + 1)  # variable object counts
        ]
        cam[str(img)] = dict(cam_K=rng.normal(size=9).tolist(), depth_scale=0.1)
        info[str(img)] = [
            dict(bbox_obj=[1, 2, 3, 4], bbox_visib=[0, 1, 2, 3],
                 visib_fract=0.5 + 0.1 * img, px_count_visib=100 + img)
            for _ in range(img + 1)
        ]
    paths = {}
    for name, d in [("gt", gt), ("cam", cam), ("info", info)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(d))
        paths[name] = str(p)
    return paths


def test_fallback_matches_native(bop_jsons):
    py = bop_store._py_parse_scene_gt(bop_jsons["gt"])
    out = bop_store.parse_scene_gt(bop_jsons["gt"])
    for a, b in zip(py, out):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    if bop_store.native_available():
        # force the python path and compare the other two parsers too
        pc = bop_store._py_parse_scene_camera(bop_jsons["cam"])
        nc = bop_store.parse_scene_camera(bop_jsons["cam"])
        for a, b in zip(pc, nc):
            np.testing.assert_allclose(a, b, rtol=1e-6)
        pi = bop_store._py_parse_scene_gt_info(bop_jsons["info"])
        ni = bop_store.parse_scene_gt_info(bop_jsons["info"])
        for a, b in zip(pi, ni):
            np.testing.assert_allclose(a, b, rtol=1e-6)


def test_sequence_views(bop_jsons):
    seq = bop_store.load_sequence(bop_jsons["gt"], bop_jsons["cam"], bop_jsons["info"])
    assert 2 in seq and 99 not in seq
    o = seq.objects(2)
    assert o["rotations"].shape == (3, 3, 3)
    assert o["obj_ids"].shape == (3,)
    assert o["cam_K"].shape == (3, 3)
    np.testing.assert_allclose(o["visib_fract"], 0.7, atol=1e-6)
    assert o["px_count_visib"].tolist() == [102, 102, 102]
