"""End-to-end CLI test: tools/train.py a few iterations on a synthetic BOP
dataset, then tools/test.py --eval on it — the full user-facing path."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from synthetic_bop import build_synthetic_bop

REPO = Path(__file__).resolve().parents[1]


CONFIG_TMPL = '''
dataset_root = r"{root}"
CLASS_NAMES = ("obj_a", "obj_b")
symmetry_types = {{"cls_2": {{}}}}
mesh_diameter = {diameters}
image_scale = 64
normalize_mean = [0.0, 0.0, 0.0]
normalize_std = [255.0, 255.0, 255.0]

train_pipeline = [
    dict(type="LoadImages", color_type="unchanged"),
    dict(type="LoadMasks"),
    dict(type="PoseJitter", jitter_angle_dis=(0, 10), jitter_x_dis=(0, 8),
         jitter_y_dis=(0, 8), jitter_z_dis=(0, 20), angle_limit=45,
         translation_limit=200, add_limit=1.0,
         mesh_dir=dataset_root + "/models_eval", mesh_diameter=mesh_diameter,
         jitter_pose_field=["gt_rotations", "gt_translations"],
         jittered_pose_field=["ref_rotations", "ref_translations"]),
    dict(type="ComputeBbox", mesh_dir=dataset_root + "/models_eval", clip_border=False),
    dict(type="Crop", size_range=(1.0, 1.25), crop_bbox_field="ref_bboxes",
         clip_border=False, pad_val=128),
    dict(type="Resize", img_scale=image_scale, keep_ratio=True),
    dict(type="Pad", size=(image_scale, image_scale), center=True,
         pad_val=dict(img=(128, 128, 128), mask=0)),
    dict(type="RemapPose", keep_intrinsic=False),
    dict(type="Normalize", mean=normalize_mean, std=normalize_std, to_rgb=True),
    dict(type="ToTensor", stack_keys=[]),
    dict(type="Collect",
         annot_keys=["ref_rotations", "ref_translations", "gt_rotations",
                     "gt_translations", "gt_masks", "init_add_error",
                     "init_rot_error", "init_trans_error", "k", "labels"],
         meta_keys=("img_path", "ori_shape", "ori_k", "img_shape",
                    "img_norm_cfg", "scale_factor", "transform_matrix",
                    "ori_gt_rotations", "ori_gt_translations")),
]
test_pipeline = [
    dict(type="LoadImages", color_type="unchanged"),
    dict(type="ComputeBbox", mesh_dir=dataset_root + "/models_eval",
         clip_border=False, filter_invalid=False),
    dict(type="Crop", size_range=(1.1, 1.1), crop_bbox_field="ref_bboxes",
         clip_border=False, pad_val=128),
    dict(type="Resize", img_scale=image_scale, keep_ratio=True),
    dict(type="Pad", size=(image_scale, image_scale), center=True,
         pad_val=dict(img=(128, 128, 128), mask=0)),
    dict(type="RemapPose", keep_intrinsic=False),
    dict(type="Normalize", mean=normalize_mean, std=normalize_std, to_rgb=True),
    dict(type="ToTensor", stack_keys=[]),
    dict(type="Collect",
         annot_keys=["ref_rotations", "ref_translations", "gt_rotations",
                     "gt_translations", "labels", "k", "ori_k",
                     "transform_matrix"],
         meta_keys=("img_path", "ori_shape", "img_shape", "img_norm_cfg",
                    "scale_factor", "keypoints_3d", "geometry_transform_mode",
                    "transform_matrix", "ori_k")),
]

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    test_samples_per_gpu=1,
    train=dict(
        type="SuperviseTrainDataset",
        data_root=dataset_root + "/train_real",
        gt_annots_root=dataset_root + "/train_real",
        image_list=dataset_root + "/image_lists/train.txt",
        keypoints_json=dataset_root + "/keypoints.json",
        pipeline=train_pipeline, class_names=CLASS_NAMES, keypoints_num=8,
        sample_num=1, mesh_symmetry=symmetry_types,
        meshes_eval=dataset_root + "/models_eval", mesh_diameter=mesh_diameter,
    ),
    test=dict(
        type="RefineDataset",
        data_root=dataset_root + "/train_real",
        ref_annots_root=dataset_root + "/initial_poses",
        image_list=dataset_root + "/image_lists/train.txt",
        keypoints_json=dataset_root + "/keypoints.json",
        pipeline=test_pipeline, class_names=CLASS_NAMES, keypoints_num=8,
        mesh_symmetry=symmetry_types,
        meshes_eval=dataset_root + "/models_eval", mesh_diameter=mesh_diameter,
    ),
)

model = dict(
    type="{model_type}",
    cxt_channels=128, h_channels=128, seperate_encoder=False, max_flow=400.0,
    filter_invalid_flow=True,
    filter_invalid_flow_by_mask=True,
    encoder=dict(type="RAFTEncoder", in_channels=3, out_channels=256,
                 net_type="Basic", norm_cfg=dict(type="IN")),
    cxt_encoder=dict(type="RAFTEncoder", in_channels=3, out_channels=256,
                     net_type="Basic", norm_cfg=dict(type="BN")),
    decoder=dict(
        type="{decoder_type}", net_type="Basic", num_levels=4, radius=4,
        iters=2, detach_flow=True, detach_mask=True, detach_pose=True,
        detach_depth_for_xy=True, mask_flow=False, mask_corr=False,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=2,
                           in_channels=224, rotation_mode="ortho6d"),
        gru_type="SeqConv"),
    flow_loss_cfg=dict(type="SequenceLoss", gamma=0.8,
                       loss_func_cfg=dict(type="RAFTLoss", loss_weight=0.1,
                                          max_flow=400.0)),
    pose_loss_cfg=dict(type="SequenceLoss", gamma=0.8,
                       loss_func_cfg=dict(
                           type="DisentanglePointMatchingLoss",
                           symmetry_types=symmetry_types,
                           mesh_diameter=mesh_diameter,
                           mesh_path=dataset_root + "/models_eval",
                           loss_type="l1", disentangle_z=True,
                           loss_weight=10.0)),
    mask_loss_cfg=dict(type="SequenceLoss", gamma=0.8,
                       loss_func_cfg=dict(type="L1Loss", loss_weight=10.0)),
    occlusion_loss_cfg=dict(type="SequenceLoss", gamma=0.8,
                            loss_func_cfg=dict(type="L1Loss", loss_weight=100.0)),
    train_cfg=dict(),
    test_cfg=dict(iters=2, sample_points=dict(num=500, mode="topk")),
    renderer=dict(mesh_dir=dataset_root + "/models_1024",
                  image_size=(image_scale, image_scale),
                  shader_type="Phong", background_color=(0.5, 0.5, 0.5)),
)

optimizer = dict(type="AdamW", lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                 weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=10.0))
lr_config = dict(policy="OneCycle", max_lr=1e-3, total_steps=200,
                 pct_start=0.05, anneal_strategy="linear")
evaluation = dict(interval=1000000, metric={{"add": [0.1, 0.5]}},
                  save_best="average/add_10", rule="greater")
runner = dict(type="IterBasedRunner", max_iters=4)
checkpoint_config = dict(interval=4, by_epoch=False)
log_config = dict(interval=1, hooks=[dict(type="TextLoggerHook")])
work_dir = r"{work_dir}"
'''


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
    root = tmp_path_factory.mktemp("e2e")
    info = build_synthetic_bop(root / "data", num_images=3, render_images=True)
    return root, info


@pytest.mark.slow
class TestCLI:
    def test_train_and_test_scflow(self, workspace):
        root, info = workspace
        work_dir = root / "work"
        cfg_path = root / "scflow_tiny.py"
        cfg_path.write_text(
            CONFIG_TMPL.format(
                root=str(root / "data"), diameters=info["diameters"],
                work_dir=str(work_dir), model_type="SCFlowRefiner",
                decoder_type="SCFlowDecoder",
            )
        )
        r = run([sys.executable, "tools/train.py", str(cfg_path)])
        assert r.returncode == 0, r.stderr[-4000:]
        ckpts = work_dir / "checkpoints"
        assert ckpts.exists() and any(ckpts.iterdir()), r.stderr[-2000:]

        ckpt = str(ckpts / "4")
        r2 = run(
            [sys.executable, "tools/test.py", str(cfg_path),
             "--checkpoint", ckpt, "--eval",
             "--format-only", "--save-dir", str(root / "bop_out")]
        )
        assert r2.returncode == 0, r2.stderr[-4000:]
        # BOP export exists
        out = root / "bop_out" / "000001" / "scene_gt.json"
        assert out.exists()
        content = json.loads(out.read_text())
        assert len(content) == 3
        # eval json dumped
        evals = list(work_dir.glob("eval_*.json"))
        assert evals, r2.stderr[-2000:]
        metrics = json.loads(evals[-1].read_text())
        assert "average/add_10" in metrics


    def test_resume_continues_from_checkpoint(self, workspace):
        """--resume restores step + optimizer state from the latest
        checkpoint and continues the schedule (SURVEY §5 checkpoint/resume;
        reference runner.resume, train.py:170-175).  Depends on the scflow
        train test having produced checkpoints/4."""
        root, info = workspace
        work_dir = root / "work"
        cfg_path = root / "scflow_tiny.py"
        assert (work_dir / "checkpoints" / "4").exists(), \
            "run after test_train_and_test_scflow"
        r = run([sys.executable, "tools/train.py", str(cfg_path),
                 "--resume", "--max-iters", "8",
                 "--work-dir", str(work_dir)])
        assert r.returncode == 0, r.stderr[-4000:]
        log = r.stderr + r.stdout
        assert "Resumed from iter 4" in log
        assert "Start training: iter 4 -> 8" in log
        assert (work_dir / "checkpoints" / "8").exists()  # ckpt interval 4

    def test_train_and_test_raft(self, workspace):
        """RAFT flow+occlusion refiner through the CLI, exercising the
        PnP-from-flow eval path."""
        root, info = workspace
        work_dir = root / "work_raft"
        cfg_path = root / "raft_tiny.py"
        cfg_path.write_text(
            CONFIG_TMPL.format(
                root=str(root / "data"), diameters=info["diameters"],
                work_dir=str(work_dir), model_type="RAFTRefinerFlowMask",
                decoder_type="RAFTDecoderMask",
            )
        )
        r = run([sys.executable, "tools/train.py", str(cfg_path)])
        assert r.returncode == 0, r.stderr[-4000:]
        ckpt = str(work_dir / "checkpoints" / "4")
        r2 = run(
            [sys.executable, "tools/test.py", str(cfg_path),
             "--checkpoint", ckpt, "--eval"]
        )
        assert r2.returncode == 0, r2.stderr[-4000:]
        evals = list(work_dir.glob("eval_*.json"))
        assert evals
        metrics = json.loads(evals[-1].read_text())
        assert "average/add_10" in metrics
