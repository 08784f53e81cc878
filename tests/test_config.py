"""Config system unit tests: CLI override parsing (mmcv DictAction
semantics, ref `test.py:41-46`) and dotted-key merging."""

from scflow_tpu.config import Config


def test_parse_option_value_literals_and_strings():
    p = Config.parse_option_value
    assert p("4") == 4
    assert p("0.5") == 0.5
    assert p("True") is True
    assert p("true") is True
    assert p("False") is False
    assert p("false") is False
    assert p("None") is None
    assert p("[1, 2]") == [1, 2]
    assert p("(256, 256)") == (256, 256)
    # DictAction behavior: unparseable values are plain strings, so
    # `--cfg-options model.dtype=bf16` works without shell quoting
    assert p("bf16") == "bf16"
    assert p("'bf16'") == "bf16"
    # top-level comma -> tuple; quoted/bracketed commas do not split
    assert p("1,2") == (1, 2)
    assert p("a,b") == ("a", "b")
    assert p("[1,2],[3,4]") == ([1, 2], [3, 4])
    assert p("'a,b'") == "a,b"


def test_merge_from_dict_dotted_keys():
    cfg = Config({"model": {"dtype": None, "decoder": {"iters": 8}}})
    cfg.merge_from_dict({
        "model.dtype": Config.parse_option_value("bf16"),
        "model.decoder.iters": Config.parse_option_value("4"),
        "data.samples_per_gpu": Config.parse_option_value("2"),
    })
    assert cfg["model"]["dtype"] == "bf16"
    assert cfg["model"]["decoder"]["iters"] == 4
    assert cfg["data"]["samples_per_gpu"] == 2


def test_norm_stats_from_cfg():
    from scflow_tpu.apis import norm_stats_from_cfg

    cfg = Config({
        "data": {
            "test": {"pipeline": [
                {"type": "LoadImages"},
                {"type": "Normalize", "mean": [103.5, 116.3, 123.7],
                 "std": [57.4, 57.1, 58.4]},
            ]},
        }
    })
    mean, std = norm_stats_from_cfg(cfg)
    assert mean == (103.5, 116.3, 123.7) and std == (57.4, 57.1, 58.4)

    # no Normalize anywhere -> reference defaults
    mean, std = norm_stats_from_cfg(Config({"data": {"test": {"pipeline": []}}}))
    assert mean == (0.0, 0.0, 0.0) and std == (255.0, 255.0, 255.0)


def test_checkpoint_manager_accepts_mmcv_keep_all(tmp_path):
    """mmcv's max_keep_ckpts=-1 (keep all) must map to orbax None, not a
    ValueError at train startup."""
    from scflow_tpu.runtime.checkpoint import CheckpointManager

    CheckpointManager(str(tmp_path), max_to_keep=-1)
