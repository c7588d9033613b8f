"""Donor torch-checkpoint importer tests: synthetic state dicts in the
milesial-UNet and HRNet-Semantic-Seg naming schemes mapped onto our Flax
params (train.py:470-505 / models.py:804-832 capability)."""
import numpy as np
import pytest
import torch

import jax

from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
    UNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
    HierarchicalSegmenter,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.torch_import import (
    load_donor_weights,
    load_torch_state_dict,
    translate_flax_path,
)


def test_translate_unet_paths():
    cands = translate_flax_path(
        ("backbone", "inc", "conv0", "kernel"), "params", 0
    )
    assert "inc.double_conv.0.weight" in cands
    assert "inc0.conv.conv.0.weight" in cands
    cands = translate_flax_path(
        ("backbone", "down1", "conv", "bn1", "scale"), "params", 0
    )
    assert "down1.maxpool_conv.1.double_conv.4.weight" in cands
    cands = translate_flax_path(
        ("backbone", "up2", "conv", "bn0", "mean"), "batch_stats", 0
    )
    assert "up2.conv.double_conv.1.running_mean" in cands


def test_translate_hrnet_paths():
    # both the reference model's Sequential naming and the upstream
    # published-checkpoint naming must be candidates
    assert translate_flax_path(("backbone", "stem_conv0", "kernel"),
                               "params", 1) == ["stem.0.weight", "conv1.weight"]
    assert translate_flax_path(("backbone", "stem_bn1", "scale"),
                               "params", 1) == ["stem.4.weight", "bn2.weight"]
    assert translate_flax_path(
        ("backbone", "layer1", "block0", "downsample_conv", "kernel"),
        "params", 1) == ["layer1.0.downsample.0.weight"]
    assert translate_flax_path(
        ("backbone", "stage3_m2", "branch1", "block3", "conv2", "kernel"),
        "params", 1) == ["stage3.2.branches.1.3.conv2.weight"]
    assert translate_flax_path(
        ("backbone", "stage2_m0", "fuse0_1", "conv", "kernel"),
        "params", 1) == ["stage2.0.fuse_layers.0.1.0.weight"]
    assert translate_flax_path(
        ("backbone", "stage4_m1", "fuse3_0", "bn2", "var"),
        "batch_stats", 1) == ["stage4.1.fuse_layers.3.0.2.1.running_var"]
    assert translate_flax_path(
        ("backbone", "transition1", "t1_conv0", "kernel"),
        "params", 1) == ["transition1.1.0.0.weight"]
    shead = translate_flax_path(
        ("backbone", "shared_head_conv", "kernel"), "params", 1)
    assert "shared_head.0.weight" in shead and "last_layer.0.weight" in shead


def test_unet_donor_roundtrip(tmp_path, default_tree):
    """Write a milesial-style state dict whose conv values we can recognize
    after import (incl. OIHW->HWIO transpose)."""
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=False
    )
    x = np.zeros((1, 16, 16, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]

    k = np.asarray(params["backbone"]["inc"]["conv0"]["kernel"])  # (3,3,3,8)
    donor_conv = np.arange(np.prod(k.shape), dtype=np.float32).reshape(
        k.shape[3], k.shape[2], k.shape[0], k.shape[1]  # OIHW
    )
    sd = {
        "inc.double_conv.0.weight": torch.from_numpy(donor_conv),
        "inc.double_conv.0.bias": torch.zeros(8) + 7.0,
        "inc.double_conv.1.weight": torch.zeros(8) + 3.0,  # bn scale
        "module.down1.maxpool_conv.1.double_conv.0.weight":
            torch.zeros(3, 3, 8, 16).permute(3, 2, 0, 1).contiguous() + 0.5,
    }
    pth = str(tmp_path / "donor.pth")
    torch.save(sd, pth)

    new_params, new_bs = load_donor_weights(
        pth, params, variables.get("batch_stats", {}), model_select=0
    )
    got = np.asarray(new_params["backbone"]["inc"]["conv0"]["kernel"])
    np.testing.assert_array_equal(got, donor_conv.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["inc"]["conv0"]["bias"]), 7.0 * np.ones(8)
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["inc"]["bn0"]["scale"]), 3.0 * np.ones(8)
    )
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["down1"]["conv"]["conv0"]["kernel"]),
        0.5,
    )
    # unmatched leaves keep their init (not re-randomized)
    head_before = np.asarray(params["head_flat"]["kernel"])
    head_after = np.asarray(new_params["head_flat"]["kernel"])
    np.testing.assert_array_equal(head_before, head_after)


def test_prefix_stripping(tmp_path):
    sd = {"model.module.net.layer.weight": torch.ones(2, 2)}
    pth = str(tmp_path / "p.pth")
    torch.save({"state_dict": sd}, pth)
    out = load_torch_state_dict(pth)
    assert list(out) == ["layer.weight"]


def test_shape_mismatch_is_skipped(tmp_path, default_tree):
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=False
    )
    x = np.zeros((1, 16, 16, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    sd = {"inc.double_conv.0.weight": torch.zeros(99, 3, 3, 3)}  # wrong O
    pth = str(tmp_path / "bad.pth")
    torch.save(sd, pth)
    new_params = load_donor_weights(pth, params, model_select=0)
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["inc"]["conv0"]["kernel"]),
        np.asarray(params["backbone"]["inc"]["conv0"]["kernel"]),
    )
