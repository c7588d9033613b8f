"""Config-system tests: YAML loader (ours + the reference's shipped file),
presets, RunConfig level masking, CLI arg parsing."""
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
    hrnet_w18,
    hrnet_w32,
    hrnet_w48,
    load_hrnet_yaml,
)
from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig


def test_yaml_loader_on_our_asset(assets_dir):
    cfg = load_hrnet_yaml(str(assets_dir / "seg_hrnet_w48.yaml"))
    assert cfg == hrnet_w48()
    assert cfg.last_channels == 720
    assert cfg.stage1.block == "BOTTLENECK"
    assert cfg.stage4.num_channels == (48, 96, 192, 384)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_yaml_loader_on_reference_file():
    """The reference's shipped YAML (with its NUM_RANCHES typo) must load."""
    path = ("/root/reference/config/"
            "seg_hrnet_w48_520x520_ohem_sgd_lr1e-3_wd1e-4_bs_16_epoch110.yaml")
    cfg = load_hrnet_yaml(path)
    assert cfg.stage2.num_channels == (48, 96)
    assert cfg.stage3.num_modules == 4
    assert cfg.final_conv_kernel == 1
    assert cfg.last_channels == 720


def test_width_presets():
    assert hrnet_w18().last_channels == 18 + 36 + 72 + 144
    assert hrnet_w32().last_channels == 32 + 64 + 128 + 256
    from restrictive_hierarchical_semantic_segmentation_tpu.config import (
        hrnet_w64,
    )
    assert hrnet_w64().last_channels == 64 + 128 + 256 + 512


def test_level_mask_schedule():
    cfg = RunConfig(level0_pretrain_epochs=5)
    # train.py:125-133: cap = min(n_levels-1, epoch // pretrain)
    assert cfg.level_mask_for_epoch(1, 2) == [1.0, 0.0]
    assert cfg.level_mask_for_epoch(4, 2) == [1.0, 0.0]
    assert cfg.level_mask_for_epoch(5, 2) == [1.0, 1.0]
    assert cfg.level_mask_for_epoch(40, 2) == [1.0, 1.0]
    cfg2 = RunConfig()
    assert cfg2.level_mask_for_epoch(1, 4) == [1.0] * 4


def test_train_cli_arg_parsing(assets_dir):
    from restrictive_hierarchical_semantic_segmentation_tpu.cli.train import (
        config_from_args,
        get_args,
    )

    args = get_args([
        "--save-path", "x", "--data-root", "d",
        "--tree-root", str(assets_dir / "class_tree_tl.json"),
        "--class-map", str(assets_dir / "class_map.csv"),
        "--learning-rate", "[0.018]",
        "--level-weights",
        "[[0.0297,1.577,0.9619,0.1770],[1.5432,0.2638,1.0413,3.9722]]",
        "--model-type", "1", "--model-select", "1", "--img-size", "620",
        "--batch-size", "4", "--folds", "5", "--inc-cross-val", "True",
        "--learning-rate-scheduler-minimum", "0.001",
    ])
    cfg = config_from_args(args)
    assert cfg.lr == 0.018
    assert cfg.level_weights[1][3] == 3.9722
    assert cfg.hierarchical and cfg.model_select == 1
    assert cfg.img_size == 620 and cfg.folds == 5 and cfg.inc_cross_val
    assert cfg.lrs_min == 0.001


def test_predict_cli_arg_parsing(assets_dir):
    from restrictive_hierarchical_semantic_segmentation_tpu.cli.predict_eval import (
        get_args,
    )

    args = get_args([
        "--save-loc", "out", "--full-ds", "d", "--model-weights", "w",
        "--tree-root", "t", "--class-map", "c", "--model-type", "1",
        "--folds", "5",
    ])
    assert args.root == "d" and args.folds == 5


def test_resolve_hrnet_config_shorthands(assets_dir):
    """--config accepts w18/w32/w48 shorthands (the reference's
    hrnet_config.py MODEL_CONFIGS family, vestigial there) or a YAML path."""
    from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
        hrnet_w48,
        resolve_hrnet_config,
    )

    for name, width, last in (("w18", 18, 270), ("w32", 32, 480),
                              ("w48", 48, 720), ("w64", 64, 960)):
        cfg = resolve_hrnet_config(name)
        assert cfg.stage4.num_channels[0] == width
        assert cfg.last_channels == last
    via_yaml = resolve_hrnet_config(str(assets_dir / "seg_hrnet_w48.yaml"))
    assert via_yaml == hrnet_w48()
