"""Supervised training dataset: GT poses jittered in-pipeline
(reference datasets/supervise_refine.py)."""

import itertools
from os import path as osp
from typing import Optional

import numpy as np

from scflow_tpu.datasets.base import BaseDataset
from scflow_tpu.datasets.utils import ascii_table
from scflow_tpu.registry import DATASETS


@DATASETS.register_module("SuperviseTrainDataset")
class SuperviseTrainDataset(BaseDataset):
    def __init__(
        self,
        data_root,
        image_list,
        pipeline,
        gt_annots_root: str,
        keypoints_json: str,
        keypoints_num: int,
        class_names: tuple,
        min_visib_fract=0.0,
        min_visib_px_num=0,
        sample_num=1,
        label_mapping: Optional[dict] = None,
        target_label: Optional[list] = None,
        meshes_eval: Optional[str] = None,
        mesh_symmetry: dict = {},
        mesh_diameter: list = [],
    ):
        super().__init__(
            data_root=data_root,
            image_list=image_list,
            keypoints_json=keypoints_json,
            pipeline=pipeline,
            class_names=class_names,
            label_mapping=label_mapping,
            keypoints_num=keypoints_num,
            meshes_eval=meshes_eval,
            mesh_symmetry=mesh_symmetry,
            mesh_diameter=mesh_diameter,
            target_label=target_label,
            gt_annots_root=gt_annots_root,
        )
        self.min_visib_fract = min_visib_fract
        self.min_visib_px_num = min_visib_px_num
        self.sample_num = sample_num
        self.mask_path_tmpl = "{:06d}/mask_visib/{:06d}_{:06d}.png"
        self.total_sample_num = self._sample_census()

    def _sample_census(self):
        """Per-class valid/total sample table (supervise_refine.py:57-86)."""
        counts = {
            name: {"total_sample_num": 0, "valid_sample_num": 0}
            for name in self.class_names
        }
        for seq, annots in self.gt_seq_pose_annots.items():
            for img_key, infos in annots["gt_info"].items():
                poses = annots["pose"][img_key]
                for info, pose in zip(infos, poses):
                    ori = pose["obj_id"]
                    counts[self.class_names[ori - 1]]["total_sample_num"] += 1
                    label = ori
                    if self.label_mapping is not None:
                        if ori not in self.label_mapping:
                            continue
                        label = self.label_mapping[ori]
                    if self.target_label is not None and label not in self.target_label:
                        continue
                    if info["visib_fract"] < self.min_visib_fract:
                        continue
                    counts[self.class_names[ori - 1]]["valid_sample_num"] += 1
        rows = [["class"] + list(self.class_names) + ["total"]]
        for key in ("total_sample_num", "valid_sample_num"):
            vals = [counts[n][key] for n in self.class_names]
            rows.append([key] + vals + [sum(vals)])
        return ascii_table(rows)

    def getitem(self, index):
        img_path = self.img_files[index]
        _, seq_name, _, img_name = img_path.rsplit("/", 3)
        img_id = int(osp.splitext(img_name)[0])
        seq = self.gt_seq_pose_annots[seq_name]

        def fetch(d, key):
            return d[str(key)] if str(key) in d else d["{:06d}".format(key)]

        gt_pose = fetch(seq["pose"], img_id)
        camera = fetch(seq["camera"], img_id)
        gt_infos = fetch(seq["gt_info"], img_id)

        rotations, translations, labels, bboxes, mask_paths = [], [], [], [], []
        for i, ann in enumerate(gt_pose):
            obj_id = ann["obj_id"]
            if self.target_label is not None and obj_id not in self.target_label:
                continue
            if self.label_mapping is not None:
                if obj_id not in self.label_mapping:
                    continue
                obj_id = self.label_mapping[obj_id]
            if gt_infos[i]["visib_fract"] < self.min_visib_fract:
                continue
            if gt_infos[i].get("px_count_visib", 1) < self.min_visib_px_num:
                continue
            rotations.append(np.array(ann["cam_R_m2c"], np.float32).reshape(3, 3))
            translations.append(np.array(ann["cam_t_m2c"], np.float32).reshape(-1))
            labels.append(obj_id)
            bbox = np.array(gt_infos[i]["bbox_obj"], np.float32)
            bbox[2:] = bbox[:2] + bbox[2:]
            bboxes.append(bbox)
            mask_id = gt_infos[i].get("mask_id", i)
            mask_paths.append(
                osp.join(
                    self.data_root,
                    self.mask_path_tmpl.format(int(seq_name), img_id, mask_id),
                )
            )
        if not labels:
            return None
        rotations = np.stack(rotations)
        translations = np.stack(translations)
        labels = np.asarray(labels, np.int64) - 1
        bboxes = np.stack(bboxes)

        n = len(labels)
        sample_num = n if self.sample_num == -1 else self.sample_num
        choice = np.random.choice(n, sample_num)
        rotations = rotations[choice]
        translations = translations[choice]
        labels = labels[choice]
        bboxes = bboxes[choice]
        kp3d = self.keypoints_3d[labels]
        mask_paths = [mask_paths[c] for c in choice]

        k = np.array(camera["cam_K"], np.float32).reshape(3, 3)
        k = np.repeat(k[None], sample_num, axis=0)

        rd = dict(
            pose_fields=[
                ("gt_rotations", "gt_translations", "gt_keypoints_3d"),
                ("ref_rotations", "ref_translations", "ref_keypoints_3d"),
            ],
            bbox_fields=["gt_bboxes", "ref_bboxes"],
            mask_fields=["gt_masks"],
            label_fields=["labels"],
        )
        rd["annot_fields"] = (
            rd["bbox_fields"] + rd["mask_fields"] + rd["label_fields"]
            + list(itertools.chain(*rd["pose_fields"])) + ["k"]
        )
        rd.update(
            gt_rotations=rotations,
            gt_translations=translations,
            gt_keypoints_3d=kp3d,
            ref_keypoints_3d=kp3d.copy(),
            ori_gt_rotations=rotations.copy(),
            ori_gt_translations=translations.copy(),
            labels=labels,
            gt_bboxes=bboxes,
            gt_mask_path=mask_paths,
            k=k,
            ori_k=k,
            img_path=img_path,
        )
        return self.transformer(rd)
