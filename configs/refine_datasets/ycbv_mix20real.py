# Mixed training with a 20% subsample of the real data + PBR
# (reference configs/refine_datasets/ycbv_mix20real.py).

_base_ = "./ycbv_mixpbr.py"

dataset_root = "data/ycbv"

_base_cfg = load_cfg_vars("./ycbv_mixpbr.py")
_train = _base_cfg["data"]["train"]
_train["dataset_configs"][0]["image_list"] = (
    dataset_root + "/image_lists/train_real_20.txt"
)
_train["ratios"] = [1.0, 2.0]
data = dict(train=_train)
del _base_cfg, _train
