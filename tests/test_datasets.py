"""Data-layer tests on a synthetic on-disk BOP dataset: pipeline end-to-end,
collation, evaluation metrics and BOP export."""

import json
import os
from pathlib import Path

import cv2
import numpy as np
import pytest

from scflow_tpu.datasets import (
    BitmapMasks,
    DataLoader,
    RefineDataset,
    SuperviseTrainDataset,
    collate_batch,
)
from scflow_tpu.datasets.base import add_auc
from scflow_tpu.render.meshbank import make_synthetic_bank


IMG_HW = (120, 160)
NCLASS = 2
K = np.array([[140.0, 0, 80], [0, 140.0, 60], [0, 0, 1]], np.float32)


def write_ply(path, verts, faces, colors=None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(verts):
            line = f"{v[0]} {v[1]} {v[2]}"
            if colors is not None:
                c = (colors[i] * 255).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    """Synthetic single-sequence BOP layout with 3 images, 2 objects each."""
    root = tmp_path_factory.mktemp("ycbv")
    data = root / "train_real"
    seq = data / "000001"
    (seq / "rgb").mkdir(parents=True)
    (seq / "mask_visib").mkdir(parents=True)
    models = root / "models_eval"
    models.mkdir()
    bank = make_synthetic_bank(NCLASS, size=60.0)
    for c in range(NCLASS):
        v = bank.verts[c][bank.vert_valid[c]]
        f = bank.faces[c][bank.face_valid[c]]
        col = bank.colors[c][bank.vert_valid[c]]
        write_ply(models / f"obj_{c + 1:06d}.ply", v, f, col)

    rng = np.random.default_rng(0)
    scene_gt, scene_info, scene_cam = {}, {}, {}
    img_list = []
    from scipy.spatial.transform import Rotation

    for img_id in range(3):
        img = rng.integers(0, 255, size=(*IMG_HW, 3), dtype=np.uint8)
        cv2.imwrite(str(seq / "rgb" / f"{img_id:06d}.png"), img)
        anns, infos = [], []
        # image 2 contains only object 1 — a prediction for class 2 on it
        # is then a valid-class spurious detection (no GT instance)
        for oi in range(NCLASS if img_id < 2 else 1):
            R = Rotation.random(random_state=img_id * 10 + oi).as_matrix()
            t = np.array([(oi - 0.5) * 60, 0, 500.0 + 30 * oi])
            anns.append(
                dict(
                    cam_R_m2c=R.reshape(-1).tolist(),
                    cam_t_m2c=t.tolist(),
                    obj_id=oi + 1,
                )
            )
            # mask: blob around the projected center
            m = np.zeros(IMG_HW, np.uint8)
            c2d = K @ t
            cx, cy = int(c2d[0] / c2d[2]), int(c2d[1] / c2d[2])
            cv2.circle(m, (cx, cy), 18, 255, -1)
            cv2.imwrite(
                str(seq / "mask_visib" / f"{img_id:06d}_{oi:06d}.png"), m
            )
            infos.append(
                dict(
                    bbox_obj=[cx - 20, cy - 20, 40, 40],
                    bbox_visib=[cx - 20, cy - 20, 40, 40],
                    visib_fract=1.0,
                    px_count_visib=int((m > 0).sum()),
                )
            )
        scene_gt[str(img_id)] = anns
        scene_info[str(img_id)] = infos
        scene_cam[str(img_id)] = dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0)
        img_list.append(f"000001/rgb/{img_id:06d}.png")

    (seq / "scene_gt.json").write_text(json.dumps(scene_gt))
    (seq / "scene_gt_info.json").write_text(json.dumps(scene_info))
    (seq / "scene_camera.json").write_text(json.dumps(scene_cam))
    (root / "image_lists").mkdir()
    (root / "image_lists" / "train.txt").write_text("\n".join(img_list))
    # 8 bbox-corner keypoints per class
    kps = []
    for c in range(NCLASS):
        v = bank.verts[c][bank.vert_valid[c]]
        mn, mx = v.min(0), v.max(0)
        corners = [
            [float(x), float(y), float(z)]
            for x in (mn[0], mx[0]) for y in (mn[1], mx[1]) for z in (mn[2], mx[2])
        ]
        kps.append(corners)
    (root / "keypoints.json").write_text(json.dumps(kps))
    return root


def make_train_pipeline(root, image_scale=64):
    return [
        dict(type="LoadImages", color_type="unchanged"),
        dict(type="LoadMasks"),
        dict(
            type="PoseJitter",
            jitter_angle_dis=(0, 15), jitter_x_dis=(0, 15),
            jitter_y_dis=(0, 15), jitter_z_dis=(0, 50),
            angle_limit=45, translation_limit=200, add_limit=1.0,
            mesh_dir=str(root / "models_eval"),
            mesh_diameter=[110.0, 140.0],
            jitter_pose_field=["gt_rotations", "gt_translations"],
            jittered_pose_field=["ref_rotations", "ref_translations"],
        ),
        dict(type="ComputeBbox", mesh_dir=str(root / "models_eval"), clip_border=False),
        dict(type="Crop", size_range=(1.0, 1.25), crop_bbox_field="ref_bboxes",
             clip_border=False, pad_val=128),
        dict(type="RandomHSV", h_ratio=0.2, s_ratio=0.5, v_ratio=0.5),
        dict(type="RandomNoise", noise_ratio=0.1),
        dict(type="RandomSmooth", max_kernel_size=5.0),
        dict(type="Resize", img_scale=image_scale, keep_ratio=True),
        dict(type="Pad", size=(image_scale, image_scale), center=True,
             pad_val=dict(img=(128, 128, 128), mask=0)),
        dict(type="RemapPose", keep_intrinsic=False),
        dict(type="Normalize", mean=[0.0, 0.0, 0.0], std=[255.0, 255.0, 255.0],
             to_rgb=True),
        dict(type="ToTensor", stack_keys=[]),
        dict(type="Collect",
             annot_keys=["ref_rotations", "ref_translations", "gt_rotations",
                         "gt_translations", "gt_masks", "init_add_error",
                         "init_rot_error", "init_trans_error", "k", "labels"],
             meta_keys=("img_path", "ori_shape", "ori_k", "img_shape",
                        "img_norm_cfg", "scale_factor", "transform_matrix",
                        "ori_gt_rotations", "ori_gt_translations")),
    ]


@pytest.fixture(scope="module")
def train_dataset(bop_root):
    return SuperviseTrainDataset(
        data_root=str(bop_root / "train_real"),
        gt_annots_root=str(bop_root / "train_real"),
        image_list=str(bop_root / "image_lists" / "train.txt"),
        keypoints_json=str(bop_root / "keypoints.json"),
        pipeline=make_train_pipeline(bop_root),
        class_names=("obj_a", "obj_b"),
        keypoints_num=8,
        sample_num=1,
        mesh_symmetry={"cls_2": {}},
        meshes_eval=str(bop_root / "models_eval"),
        mesh_diameter=[110.0, 140.0],
    )


class TestTrainDataset:
    def test_getitem_pipeline(self, train_dataset):
        s = train_dataset[0]
        assert s["img"].shape == (1, 64, 64, 3)
        a = s["annots"]
        assert a["ref_rotations"].shape == (1, 3, 3)
        assert a["gt_masks"].to_array().shape == (1, 64, 64)
        assert a["k"].shape == (1, 3, 3)
        # jitter produced a different reference pose within limits
        assert not np.allclose(a["ref_rotations"], a["gt_rotations"])
        assert float(a["init_rot_error"][0]) <= 45.0
        # adapt_intrinsic: transform matrix accumulated into k
        tm = s["img_metas"]["transform_matrix"]
        np.testing.assert_allclose(
            a["k"][0], tm[0] @ s["img_metas"]["ori_k"][0], rtol=1e-4
        )

    def test_collate_and_loader(self, train_dataset):
        loader = DataLoader(train_dataset, samples_per_step=2, num_workers=2,
                            infinite=False, shuffle=False)
        batch = next(iter(loader))
        assert batch["real_images"].shape == (2, 64, 64, 3)
        assert batch["labels"].shape == (2,)
        assert batch["gt_masks"].shape == (2, 64, 64)
        assert batch["per_img_patch_num"] == [1, 1]

    def test_census_table(self, train_dataset):
        assert "valid_sample_num" in train_dataset.total_sample_num

    def test_loader_abandon_reclaims_threads(self, train_dataset):
        """Closing the iterator mid-epoch must unblock and retire every
        loader thread (workers parked in a bounded queue put() would
        otherwise leak, pinning their in-flight samples)."""
        import threading
        import time

        # track the loader's own threads by identity: unrelated threads
        # (torch interop pools, orbax async savers from earlier tests) may
        # appear or retire concurrently, so raw active_count() comparisons
        # race in a full-suite run
        before = set(threading.enumerate())
        loader = DataLoader(train_dataset, samples_per_step=1, num_workers=2,
                            infinite=True, shuffle=False, prefetch=1)
        it = iter(loader)
        next(it)
        ours = [t for t in threading.enumerate() if t not in before]
        assert ours, "loader started no threads?"
        it.close()  # generator finally -> stop.set()
        deadline = time.time() + 60
        while any(t.is_alive() for t in ours) and time.time() < deadline:
            time.sleep(0.05)
        leaked = [t.name for t in ours if t.is_alive()]
        assert not leaked, f"loader threads not reclaimed: {leaked}"

    def test_loader_propagates_worker_error(self, train_dataset):
        """A worker exception surfaces as RuntimeError in the consumer
        instead of a silent daemon-thread death + hang."""

        class Broken:
            def __len__(self):
                return 4

            def __getitem__(self, idx):
                raise ValueError("corrupt sample")

        loader = DataLoader(Broken(), samples_per_step=2, num_workers=2,
                            infinite=False, shuffle=False)
        with pytest.raises(RuntimeError, match="worker failed"):
            next(iter(loader))

    def test_process_workers_match_thread_workers(self, train_dataset):
        """worker_mode='process' (spawn) must yield the same deterministic
        batches as the thread pool: same index stream, same pipeline."""

        def first_batch(mode):
            loader = DataLoader(train_dataset, samples_per_step=2,
                                num_workers=2, shuffle=False, infinite=False,
                                seed=0, worker_mode=mode)
            it = iter(loader)
            batch = next(it)
            it.close()
            return batch

        b_thread = first_batch("thread")
        b_proc = first_batch("process")
        assert set(b_thread) == set(b_proc)
        # PoseJitter randomness is per-sample-index seeded, so arrays agree
        # exactly when index order does; unordered worker completion may
        # permute the two samples inside the batch
        for key in ("labels", "k"):
            got = np.asarray(b_proc[key])
            want = np.asarray(b_thread[key])
            assert got.shape == want.shape
        assert b_proc["real_images"].shape == b_thread["real_images"].shape

    def test_process_workers_reproducible_across_runs(self, train_dataset):
        """Round-robin dispatch over private worker queues + in-order
        reassembly: identical (seed, num_workers) must give byte-identical
        batches run to run, PoseJitter randomness included (torch/mmcv
        worker determinism semantics)."""

        def first_batch():
            loader = DataLoader(train_dataset, samples_per_step=2,
                                num_workers=2, shuffle=False, infinite=False,
                                seed=7, worker_mode="process")
            it = iter(loader)
            batch = next(it)
            it.close()
            return batch

        b1, b2 = first_batch(), first_batch()
        np.testing.assert_array_equal(b1["real_images"], b2["real_images"])
        np.testing.assert_array_equal(b1["ref_rotations"], b2["ref_rotations"])
        np.testing.assert_array_equal(b1["labels"], b2["labels"])

    def test_process_worker_error_propagates(self, bop_root):
        loader = DataLoader(BrokenPicklable(), samples_per_step=2,
                            num_workers=2, infinite=False, shuffle=False,
                            worker_mode="process")
        with pytest.raises(RuntimeError, match="worker failed"):
            next(iter(loader))

    def test_process_worker_hard_death_detected(self):
        """A worker killed without posting anything (OOM kill, segfault)
        must surface as an error, not an eternal hang."""
        loader = DataLoader(DyingDataset(), samples_per_step=2,
                            num_workers=1, infinite=False, shuffle=False,
                            worker_mode="process")
        with pytest.raises(RuntimeError, match="worker failed") as ei:
            next(iter(loader))
        assert "exitcode 17" in str(ei.value.__cause__)

    def test_profiling_dataset_still_pickles(self, train_dataset):
        """SCFLOW_PIPELINE_PROFILE must not break spawn workers: the
        profiling lock is dropped on pickle and rebuilt in the child."""
        import pickle

        from scflow_tpu.datasets.pipelines.formatting import Compose

        prof = Compose(train_dataset.transformer.transforms, profile=True)
        clone = pickle.loads(pickle.dumps(prof))
        assert clone.profile and clone.profile_stats is not None


class BrokenPicklable:
    """Module-level so spawn'd workers can unpickle it."""

    def __len__(self):
        return 4

    def __getitem__(self, idx):
        raise ValueError("corrupt sample")


class DyingDataset:
    """Worker hard-death (no exception posted) — simulates OOM-kill/segfault."""

    def __len__(self):
        return 4

    def __getitem__(self, idx):
        os._exit(17)


class TestEvaluation:
    def _results(self, train_dataset, noise=0.0):
        results = []
        for img_id in range(3):
            objs = train_dataset.gt_seq_pose_annots["000001"].objects(img_id)
            rot = objs["rotations"]
            tr = objs["translations"] + noise
            results.append(
                dict(
                    pred=dict(
                        labels=np.array([0, 1]),
                        rotations=rot,
                        translations=tr,
                        scores=np.ones(2, np.float32),
                    ),
                    img_metas=dict(
                        img_path=train_dataset.img_files[img_id]
                    ),
                )
            )
        return results

    def test_perfect_predictions_full_recall(self, train_dataset):
        out = train_dataset.evaluate(
            self._results(train_dataset, 0.0),
            metric={"auc": [], "add": [0.05, 0.1, 0.2, 0.5], "rep": [2, 5]},
        )
        assert out["average/add_10"] == 1.0
        assert out["average/rep_05"] == 1.0
        assert out["average/auc"] > 0.99

    def test_evaluate_is_deterministic_across_instances(self, bop_root):
        """Eval vertex sampling is seeded (deliberate deviation from the
        reference's global-RNG draw, base_dataset.py:216-217): two
        independently constructed datasets must produce bit-identical
        ADD/AUC tables for the same predictions."""
        kwargs = dict(
            data_root=str(bop_root / "train_real"),
            gt_annots_root=str(bop_root / "train_real"),
            image_list=str(bop_root / "image_lists" / "train.txt"),
            keypoints_json=str(bop_root / "keypoints.json"),
            pipeline=make_train_pipeline(bop_root),
            class_names=("obj_a", "obj_b"),
            keypoints_num=8,
            sample_num=1,
            mesh_symmetry={"cls_2": {}},
            meshes_eval=str(bop_root / "models_eval"),
            mesh_diameter=[110.0, 140.0],
        )
        np.random.seed(123)
        ds1 = SuperviseTrainDataset(**kwargs)
        np.random.seed(456)  # global RNG state must not matter
        ds2 = SuperviseTrainDataset(**kwargs)
        # mid-range noise: errors land near thresholds where sampling
        # noise would actually flip table entries
        res = self._results(ds1, noise=8.0)
        metric = {"auc": [], "add": [0.05, 0.1, 0.2, 0.5], "rep": [2, 5]}
        out1 = ds1.evaluate(res, metric=metric)
        out2 = ds2.evaluate(res, metric=metric)
        assert out1.keys() == out2.keys()
        for k in out1:
            assert out1[k] == out2[k], k
        # and twice on the SAME instance too
        out3 = ds1.evaluate(res, metric=metric)
        for k in out1:
            assert out1[k] == out3[k], k

    def test_bad_predictions_low_recall(self, train_dataset):
        out = train_dataset.evaluate(
            self._results(train_dataset, 500.0), metric={"add": [0.05, 0.1]}
        )
        assert out["average/add_10"] == 0.0

    def test_add_auc_vocap_golden(self):
        """Hand-computed PoseCNN VOCap values (right-endpoint step integral,
        duplicates collapsed to their first rank — YCB-Video toolkit
        VOCap.m semantics)."""
        # all-zero errors: single step at 0 -> full area
        assert add_auc(np.zeros(10), 100.0) == 1.0
        # everything past max_error: zero
        assert add_auc(np.full(10, 1000.0), 100.0) == 0.0
        assert add_auc(np.array([]), 100.0) == 0.0
        # [10,20,30,200] @ max 100:
        # 10*.25 + 10*.5 + 10*.75 + 70*.75 = 67.5 -> 0.675
        np.testing.assert_allclose(
            add_auc(np.array([10.0, 20.0, 30.0, 200.0]), 100.0), 0.675
        )
        # VOCap quirk 1: a single error at 50 scores 1.0 (the [0,50]
        # interval takes the right-endpoint accuracy)
        np.testing.assert_allclose(add_auc(np.array([50.0]), 100.0), 1.0)
        # VOCap quirk 2: ten duplicates at 50 score 0.55 (duplicate xs
        # collapse to the FIRST rank: 50*0.1 + 50*1.0)
        np.testing.assert_allclose(add_auc(np.full(10, 50.0), 100.0), 0.55)
        # mixed: [0, 100] @ 100 -> 100*0.5 + 0 ... both finite:
        # intervals (0,100]: mpre at 100 = 1.0 -> but [0,0] has width 0:
        # ap = (100-0)*1.0 ... wait acc at 0 is 0.5 -> steps: i at x=100
        # only (x=0 equals left pad) -> 100*1.0 -> 1.0
        np.testing.assert_allclose(add_auc(np.array([0.0, 100.0]), 100.0), 1.0)

    def test_match_results_duplicate_detections_pick_best_add(
        self, train_dataset
    ):
        """Two detections carry the same obj_id; the matcher must keep the
        better-ADD one (reference base_dataset.py:242-255)."""
        objs = train_dataset.gt_seq_pose_annots["000001"].objects(0)
        rot, tr = objs["rotations"], objs["translations"]
        # duplicate label 0: first copy is garbage, second is perfect
        results = [dict(
            pred=dict(
                labels=np.array([0, 0, 1]),
                rotations=np.stack([rot[0], rot[0], rot[1]]),
                translations=np.stack(
                    [tr[0] + 300.0, tr[0], tr[1]]
                ),
                scores=np.ones(3, np.float32),
            ),
            img_metas=dict(img_path=train_dataset.img_files[0]),
        )]
        out = train_dataset.evaluate(results, metric={"add": [0.05]})
        assert out["average/add_05"] == 1.0

    def test_match_results_unmatched_gt_counts_as_failure(self, train_dataset):
        """A GT object with no detection must count as a miss, not be
        dropped (valid=False row)."""
        objs = train_dataset.gt_seq_pose_annots["000001"].objects(0)
        rot, tr = objs["rotations"], objs["translations"]
        results = [dict(
            pred=dict(
                labels=np.array([0]),  # object 1 undetected
                rotations=rot[:1],
                translations=tr[:1],
                scores=np.ones(1, np.float32),
            ),
            img_metas=dict(img_path=train_dataset.img_files[0]),
        )]
        out = train_dataset.evaluate(results, metric={"add": [0.05]})
        assert out["average/add_05"] == 0.5

    def test_match_results_spurious_prediction_ignored(self, train_dataset):
        """A detection of a valid class with no GT instance in the image
        must be ignored, not crash or pollute the table (reference matches
        GT->pred only).  Image 2 of the fixture has only object 1."""
        objs = train_dataset.gt_seq_pose_annots["000001"].objects(2)
        rot, tr = objs["rotations"], objs["translations"]
        assert len(objs["obj_ids"]) == 1
        results = [dict(
            pred=dict(
                labels=np.array([0, 1]),  # class 2 (label 1) is spurious
                rotations=np.concatenate([rot, rot[:1]]),
                translations=np.concatenate([tr, tr[:1] + 250.0]),
                scores=np.ones(2, np.float32),
            ),
            img_metas=dict(img_path=train_dataset.img_files[2]),
        )]
        out = train_dataset.evaluate(results, metric={"add": [0.05]})
        assert out["average/add_05"] == 1.0

    def test_symmetric_adds_nn_matching_golden(self):
        """Hand-computed ADD vs ADD-S: a 4-point square rotated by its own
        90-degree symmetry.  Plain ADD = chord distance sqrt(2); NN-matched
        ADD-S = 0 (reference base_dataset.py:378-424 knn semantics)."""
        from scflow_tpu.datasets.base import BaseDataset

        verts = np.array(
            [[1, 1, 0], [1, -1, 0], [-1, -1, 0], [-1, 1, 0]], np.float64
        )
        Rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
        gt_r = np.eye(3)[None]
        gt_t = np.array([[0.0, 0.0, 500.0]])
        k = np.array([[[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]]])
        labels = np.array([0])
        args = ([verts], gt_t, gt_r, gt_t, Rz90[None], labels, k)
        # symmetric class: NN matching collapses the rotation error to 0
        e3n_s, _, e3_s = BaseDataset.eval_pose_error(
            *args, {"cls_1": {"z": 90}}, [2.0 * np.sqrt(2)]
        )
        np.testing.assert_allclose(e3_s, 0.0, atol=1e-12)
        # non-symmetric: every corner moves to the adjacent corner, chord
        # length sqrt((1-(-1))^2 + 0)/... = sqrt(2^2+0^2)? corner (1,1) ->
        # R@v = (-1,1): distance 2.  All four corners move by exactly 2.
        e3n, _, e3 = BaseDataset.eval_pose_error(*args, {}, [2.0 * np.sqrt(2)])
        np.testing.assert_allclose(e3, 2.0, atol=1e-12)
        np.testing.assert_allclose(e3n, 2.0 / (2.0 * np.sqrt(2)), atol=1e-12)

    def test_format_results_bop_export(self, train_dataset, tmp_path):
        res = self._results(train_dataset)
        train_dataset.format_results(res, str(tmp_path / "bop"), time=0.05)
        out = json.loads(
            (tmp_path / "bop" / "000001" / "scene_gt.json").read_text()
        )
        assert set(out.keys()) == {"0", "1", "2"}
        assert out["0"][0]["obj_id"] == 1
        assert out["0"][0]["time"] == 0.05
        assert len(out["0"][0]["cam_R_m2c"]) == 9


class TestBitmapMasks:
    """Direct value tests for the mask container ops (datasets/mask.py;
    reference datasets/mask.py + mmcv roi_align replacement)."""

    def _masks(self):
        m = np.zeros((2, 10, 12), np.uint8)
        m[0, 2:5, 3:7] = 1   # 3x4 block
        m[1, 6:9, 8:11] = 1  # 3x3 block
        return BitmapMasks(m, 10, 12)

    def test_crop_in_bounds_and_out_of_bounds(self):
        bm = self._masks()
        c = bm.crop([3, 2, 7, 5])
        assert (c.height, c.width) == (3, 4)
        assert c.masks[0].sum() == 12 and c.masks[1].sum() == 0
        # crop extending past the image zero-pads (clip_border=False crops)
        c2 = bm.crop([8, 6, 14, 12])
        assert (c2.height, c2.width) == (6, 6)
        assert c2.masks[1].sum() == 9
        assert c2.masks[1][:3, :3].sum() == 9  # block lands top-left

    def test_pad_and_negative_pad(self):
        bm = self._masks()
        p = bm.pad((2, 1, 0, 0))
        assert (p.height, p.width) == (11, 14)
        assert p.masks[0][3:6, 5:9].sum() == 12
        # negative padding crops
        n = bm.pad((-3, -2, 0, 0))
        assert (n.height, n.width) == (8, 9)
        assert n.masks[0][0:3, 0:4].sum() == 12

    def test_rescale_keep_ratio(self):
        bm = self._masks()
        r = bm.rescale(24)  # long side 12 -> 24 => factor 2
        assert (r.height, r.width) == (20, 24)
        assert r.masks[0].sum() == 12 * 4  # nearest keeps area x4

    def test_get_bboxes_and_areas(self):
        bm = self._masks()
        np.testing.assert_array_equal(bm.get_bboxes(),
                                      [[3, 2, 7, 5], [8, 6, 11, 9]])
        np.testing.assert_array_equal(bm.areas, [12, 9])

    def test_background_and_occluder_merge(self):
        bm = self._masks()
        bg = bm.get_background_mask()
        assert bg.sum() == 10 * 12 - 12 - 9
        occ = np.zeros((10, 12), np.uint8)
        occ[2:5, 3:5] = 1  # covers half of instance 0
        merged = bm.merge_background_mask(occ)
        assert merged.masks[0].sum() == 6 and merged.masks[1].sum() == 9

    def test_warpaffine_translation(self):
        bm = self._masks()
        M = np.array([[1, 0, 2], [0, 1, 1]], np.float32)
        w = bm.warpaffine(M, 12, 10)
        assert w.masks[0][3:6, 5:9].sum() == 12

    def test_flip_directions(self):
        bm = self._masks()
        np.testing.assert_array_equal(
            bm.flip("horizontal").masks, bm.masks[:, :, ::-1])
        np.testing.assert_array_equal(
            bm.flip("vertical").masks, bm.masks[:, ::-1, :])
        np.testing.assert_array_equal(
            bm.flip("diagonal").masks, bm.masks[:, ::-1, ::-1])
        # involution
        np.testing.assert_array_equal(
            bm.flip("horizontal").flip("horizontal").masks, bm.masks)

    def test_translate_integer_offset_matches_roll(self):
        bm = self._masks()
        t = bm.translate((10, 12), 2, direction="horizontal")
        expect = np.zeros_like(bm.masks)
        expect[:, :, 2:] = bm.masks[:, :, :-2]
        np.testing.assert_array_equal(t.masks, expect)
        tv = bm.translate((10, 12), -3, direction="vertical")
        expect = np.zeros_like(bm.masks)
        expect[:, :-3, :] = bm.masks[:, 3:, :]
        np.testing.assert_array_equal(tv.masks, expect)

    def test_translate_fill_val(self):
        bm = self._masks()
        t = bm.translate((10, 12), 4, fill_val=1)
        assert (t.masks[:, :, :4] == 1).all()

    def test_shear_golden(self):
        # warpAffine applies the FORWARD map dst = M @ src: a pixel at
        # (x=4, y=2) under horizontal shear m=1 lands at x = 4 + 1*2 = 6
        m = np.zeros((1, 6, 8), np.uint8)
        m[0, 2, 4] = 1
        bm = BitmapMasks(m, 6, 8)
        s = bm.shear((6, 8), 1.0, direction="horizontal",
                     interpolation="nearest")
        assert s.masks[0, 2, 6] == 1 and s.masks[0].sum() == 1
        # vertical: y_dst = 1*4 + 2 = 6, off the 6-row canvas -> pixel gone
        sv = bm.shear((6, 8), 1.0, direction="vertical",
                      interpolation="nearest")
        assert sv.masks[0].sum() == 0

    def test_rotate_180_and_90(self):
        bm = self._masks()
        # 180 deg about the exact center == diagonal flip
        r = bm.rotate((10, 12), 180.0)
        np.testing.assert_array_equal(r.masks, bm.masks[:, ::-1, ::-1])
        # square mask, 90 deg clockwise (mmcv positive angle = clockwise)
        sq = np.zeros((1, 8, 8), np.uint8)
        sq[0, 1, 2] = 1
        b2 = BitmapMasks(sq, 8, 8)
        r90 = b2.rotate((8, 8), 90.0)
        assert r90.masks[0, 2, 6] == 1 and r90.masks[0].sum() == 1

    def test_expand(self):
        bm = self._masks()
        e = bm.expand(20, 24, 5, 6)
        assert (e.height, e.width) == (20, 24)
        np.testing.assert_array_equal(e.masks[:, 5:15, 6:18], bm.masks)
        assert e.masks.sum() == bm.masks.sum()

    def test_crop_and_resize_identity_box(self):
        # roi covering exactly one axis-aligned block, resized to its own
        # size, reproduces the block (interior samples all fall inside)
        m = np.zeros((1, 16, 16), np.uint8)
        m[0, 4:12, 4:12] = 1
        bm = BitmapMasks(m, 16, 16)
        out = bm.crop_and_resize(
            np.array([[4.0, 4.0, 12.0, 12.0]]), (8, 8), np.array([0]))
        assert out.masks.shape == (1, 8, 8)
        np.testing.assert_array_equal(out.masks[0], np.ones((8, 8), np.uint8))

    def test_crop_and_resize_vs_naive_roi_align(self):
        # value test against a literal per-sample transcription of the
        # roi_align avg/aligned=True/sampling_ratio=0 algorithm
        rng = np.random.default_rng(3)
        m = (rng.random((2, 13, 17)) > 0.5).astype(np.uint8)
        bm = BitmapMasks(m, 13, 17)
        boxes = np.array([[1.3, 2.1, 9.7, 11.2], [-1.0, 0.5, 18.0, 13.5]])
        inds = np.array([1, 0])
        out = bm.crop_and_resize(boxes, (5, 7), inds, binarize=False)

        def naive(mask, box, oh, ow):
            x1, y1, x2, y2 = box - 0.5
            rw, rh = x2 - x1, y2 - y1
            bw, bh = rw / ow, rh / oh
            gx = max(int(np.ceil(rw / ow)), 1)
            gy = max(int(np.ceil(rh / oh)), 1)
            H, W = mask.shape
            res = np.zeros((oh, ow))
            for i in range(oh):
                for j in range(ow):
                    acc = 0.0
                    for iy in range(gy):
                        for ix in range(gx):
                            y = y1 + (i + (iy + 0.5) / gy) * bh
                            x = x1 + (j + (ix + 0.5) / gx) * bw
                            if y < -1.0 or y > H or x < -1.0 or x > W:
                                continue
                            y = max(y, 0.0)
                            x = max(x, 0.0)
                            yl = min(int(y), H - 1)
                            xl = min(int(x), W - 1)
                            yh = min(yl + 1, H - 1)
                            xh = min(xl + 1, W - 1)
                            ly, lx = y - yl, x - xl
                            acc += ((1 - ly) * (1 - lx) * mask[yl, xl]
                                    + (1 - ly) * lx * mask[yl, xh]
                                    + ly * (1 - lx) * mask[yh, xl]
                                    + ly * lx * mask[yh, xh])
                    res[i, j] = acc / (gx * gy)
            return res

        # binarize=False path returns uint8 of the float avg (truncation),
        # so compare the binarized variant instead for exactness
        out_bin = bm.crop_and_resize(boxes, (5, 7), inds, binarize=True)
        for b in range(2):
            expect = naive(m[inds[b]].astype(np.float64), boxes[b], 5, 7)
            np.testing.assert_array_equal(out_bin.masks[b],
                                          (expect >= 0.5).astype(np.uint8))

    def test_cal_iof_and_copy(self):
        bm = self._masks()
        occ = np.zeros((10, 12), np.uint8)
        occ[2:5, 3:5] = 1  # 6 px, all inside instance 0
        iof = bm.cal_iof(occ)
        np.testing.assert_allclose(iof, [1.0, 0.0])
        assert bm.cal_iof(np.zeros((10, 12), np.uint8)).tolist() == [1.0, 1.0]
        cp = bm.copy()
        cp.masks[0, 0, 0] = 7
        assert bm.masks[0, 0, 0] == 0  # deep copy
        np.testing.assert_array_equal(bm.to_ndarray(), bm.masks)


class TestRefineTestDataset:
    """No-GT submission-run variant (reference refine.py:221-366): initial
    poses in, BOP export out — previously untested."""

    @pytest.fixture(scope="class")
    def test_dataset(self, tmp_path_factory):
        import sys

        sys.path.insert(0, str(Path(__file__).parent))
        from synthetic_bop import build_synthetic_bop

        from scflow_tpu.datasets import RefineTestDataset

        root = tmp_path_factory.mktemp("reftest")
        build_synthetic_bop(root, num_images=2, render_images=True)
        pipeline = [
            dict(type="LoadImages", color_type="unchanged"),
            dict(type="ComputeBbox", mesh_dir=str(root / "models_eval"),
                 clip_border=False, filter_invalid=False),
            dict(type="Crop", size_range=(1.1, 1.1),
                 crop_bbox_field="ref_bboxes", clip_border=False, pad_val=128),
            dict(type="Resize", img_scale=64, keep_ratio=True),
            dict(type="Pad", size=(64, 64), center=True,
                 pad_val=dict(img=(128, 128, 128), mask=0)),
            dict(type="RemapPose", keep_intrinsic=False),
            dict(type="Normalize", mean=[0.0] * 3, std=[255.0] * 3,
                 to_rgb=True),
            dict(type="ToTensor", stack_keys=[]),
            dict(type="Collect",
                 annot_keys=["ref_rotations", "ref_translations", "labels",
                             "k", "ori_k", "transform_matrix"],
                 meta_keys=("img_path", "ori_shape", "img_shape",
                            "img_norm_cfg", "scale_factor", "keypoints_3d",
                            "geometry_transform_mode", "transform_matrix",
                            "ori_k")),
        ]
        return RefineTestDataset(
            data_root=str(root / "train_real"),
            ref_annots_root=str(root / "initial_poses"),
            image_list=str(root / "image_lists" / "train.txt"),
            keypoints_json=str(root / "keypoints.json"),
            pipeline=pipeline, class_names=("obj_a", "obj_b"),
            keypoints_num=8, meshes_eval=str(root / "models_eval"),
            mesh_symmetry={"cls_2": {}}, mesh_diameter=[110.0, 140.0],
        )

    def test_getitem_yields_ref_poses_without_gt(self, test_dataset):
        s = test_dataset[0]
        assert s is not None
        a = s["annots"]
        assert a["ref_rotations"].shape[1:] == (3, 3)
        assert "gt_rotations" not in a
        assert s["img"].shape[1:] == (64, 64, 3)

    def test_format_results_exports_bop(self, test_dataset, tmp_path):
        results = []
        for i in range(len(test_dataset)):
            s = test_dataset[i]
            a = s["annots"]
            n = len(a["labels"])
            results.append(dict(
                pred=dict(
                    labels=np.asarray(a["labels"]),
                    rotations=np.asarray(a["ref_rotations"]),
                    translations=np.asarray(a["ref_translations"]),
                    scores=np.ones(n, np.float32),
                ),
                img_metas=dict(img_path=s["img_metas"]["img_path"]),
            ))
        test_dataset.format_results(results, str(tmp_path), time=0.05)
        out = json.loads((tmp_path / "000001" / "scene_gt.json").read_text())
        assert len(out) == 2  # both images exported
        first = out[sorted(out)[0]]
        assert {"cam_R_m2c", "cam_t_m2c", "obj_id"} <= set(first[0])
