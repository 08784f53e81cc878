# Mixed real + PBR training (ConcatDataset with 1:2 resampling ratios;
# reference configs/refine_datasets/ycbv_mixpbr.py).

_base_ = "./ycbv_real.py"

dataset_root = "data/ycbv"

_base_cfg = load_cfg_vars("./ycbv_real.py")
train_pipeline = list(_base_cfg["train_pipeline"])
train_pipeline.insert(
    5, dict(type="RandomBackground", background_dir="data/coco", p=0.3)
)
CLASS_NAMES = _base_cfg["CLASS_NAMES"]
symmetry_types = _base_cfg["symmetry_types"]
mesh_diameter = _base_cfg["mesh_diameter"]
del _base_cfg

_real = dict(
    type="SuperviseTrainDataset",
    data_root=dataset_root + "/train_real",
    gt_annots_root=dataset_root + "/train_real",
    image_list=dataset_root + "/image_lists/train_real.txt",
    keypoints_json=dataset_root + "/keypoints/bbox.json",
    pipeline=train_pipeline,
    class_names=CLASS_NAMES,
    keypoints_num=8,
    sample_num=1,
    mesh_symmetry=symmetry_types,
    meshes_eval=dataset_root + "/models_eval",
    mesh_diameter=mesh_diameter,
)
_pbr = dict(
    _real,
    data_root=dataset_root + "/train_pbr",
    gt_annots_root=dataset_root + "/train_pbr",
    image_list=dataset_root + "/image_lists/train_pbr.txt",
    min_visib_fract=0.2,
)

data = dict(
    samples_per_gpu=24,
    train=dict(
        _delete_=True,
        type="ConcatDataset",
        ratios=[1.0, 2.0],
        dataset_configs=[_real, _pbr],
    ),
)
