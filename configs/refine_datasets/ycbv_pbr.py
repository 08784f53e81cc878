# YCB-V PBR-synthetic training data variant: trains on train_pbr with
# COCO background swapping, visib_fract>=0.2 filter, batch 24
# (reference configs/refine_datasets/ycbv_pbr.py).

_base_ = "./ycbv_real.py"

dataset_root = "data/ycbv"

# rebuild the train pipeline with the RandomBackground stage inserted
_base_cfg = load_cfg_vars("./ycbv_real.py")
train_pipeline = list(_base_cfg["train_pipeline"])
# insert background swap after Crop (index 5)
train_pipeline.insert(
    5, dict(type="RandomBackground", background_dir="data/coco", p=0.3)
)
del _base_cfg

data = dict(
    samples_per_gpu=24,
    train=dict(
        data_root=dataset_root + "/train_pbr",
        gt_annots_root=dataset_root + "/train_pbr",
        image_list=dataset_root + "/image_lists/train_pbr.txt",
        min_visib_fract=0.2,
        pipeline=train_pipeline,
    ),
)
