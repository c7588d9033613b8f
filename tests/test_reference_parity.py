"""Numerical parity vs the REFERENCE implementation itself (imported read-only
from /root/reference as a test oracle — skipped when absent).

Transfers identical weights into both the reference's torch hierarchical UNet
and our Flax ``HierarchicalSegmenter`` and compares the full forward pass —
probabilities and logits at every level — in eval mode. This pins down every
architectural convention at once: conv/BN parameterization, bilinear
align_corners=True decoder upsampling, pad-to-match skip concat, FiLM
(GAP -> Linear -> gamma/beta), sigmoid level-0 parents, gated grouped softmax
and probabilistic composition.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REF)
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit._cfg = lambda *a, **k: {}
    timm.models = timm_models
    timm_models.vision_transformer = timm_vit
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.vision_transformer", timm_vit)
    from Models import models as ref_models  # noqa: E402

    return ref_models


def _copy_double_conv(tconv, fparams, fstats):
    """torch double_conv (Sequential 0..5) <- flax DoubleConv params."""
    import torch

    seq = tconv.conv
    for i, idx in ((0, 0), (1, 3)):
        k = np.asarray(fparams[f"conv{i}"]["kernel"])  # HWIO
        seq[idx].weight.data = torch.from_numpy(k.transpose(3, 2, 0, 1).copy())
        seq[idx].bias.data = torch.from_numpy(
            np.asarray(fparams[f"conv{i}"]["bias"]).copy()
        )
    for i, idx in ((0, 1), (1, 4)):
        bn = seq[idx]
        bn.weight.data = torch.from_numpy(np.asarray(fparams[f"bn{i}"]["scale"]).copy())
        bn.bias.data = torch.from_numpy(np.asarray(fparams[f"bn{i}"]["bias"]).copy())
        bn.running_mean.data = torch.from_numpy(np.asarray(fstats[f"bn{i}"]["mean"]).copy())
        bn.running_var.data = torch.from_numpy(np.asarray(fstats[f"bn{i}"]["var"]).copy())


def test_hier_unet_forward_parity(ref_models, default_tree):
    import json

    import jax
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )

    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))

    fmodel = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=64), hierarchical=True
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 36, 36, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch stats so BN isn't trivially identity
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.0, variables
    )
    params, stats = variables["params"], variables["batch_stats"]

    tmodel = ref_models.UNet(size=36, n_channels=3, hierarchy=tree_dict,
                             model_type=1)
    tmodel.eval()
    bp, bs = params["backbone"], stats["backbone"]
    _copy_double_conv(tmodel.inc0.conv, bp["inc"], bs["inc"])
    for i in range(1, 5):
        _copy_double_conv(
            getattr(tmodel, f"down{i}").mpconv[1], bp[f"down{i}"]["conv"],
            bs[f"down{i}"]["conv"],
        )
        _copy_double_conv(
            getattr(tmodel, f"up{i}").conv, bp[f"up{i}"]["conv"],
            bs[f"up{i}"]["conv"],
        )
    # heads (outconv 1x1)
    for L in range(2):
        k = np.asarray(params[f"head_l{L}"]["kernel"])
        tmodel.heads[L].conv.weight.data = torch.from_numpy(
            k.transpose(3, 2, 0, 1).copy()
        )
        tmodel.heads[L].conv.bias.data = torch.from_numpy(
            np.asarray(params[f"head_l{L}"]["bias"]).copy()
        )
    # FiLM
    w = np.asarray(params["film_l1"]["mlp"]["kernel"])  # (cond, 2C)
    tmodel.films[0].mlp[1].weight.data = torch.from_numpy(w.T.copy())
    tmodel.films[0].mlp[1].bias.data = torch.from_numpy(
        np.asarray(params["film_l1"]["mlp"]["bias"]).copy()
    )

    with torch.no_grad():
        t_probs, t_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), type=1,
            hierarchy=tree_dict,
        )
    f_probs, f_logits, _ = fmodel.apply(variables, x, train=False)

    for L in range(2):
        np.testing.assert_allclose(
            np.asarray(f_logits[L]),
            t_logits[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=2e-4,
            err_msg=f"logits level {L}",
        )
        np.testing.assert_allclose(
            np.asarray(f_probs[L]),
            t_probs[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=2e-4,
            err_msg=f"probs level {L}",
        )


def test_hier_unet_extended_tree_parity(ref_models, extended_tree):
    """Depth-4 tree: multi-group gated softmax + 4-level composition vs the
    reference's per-parent python loop, identical weights."""
    import json

    import jax
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )

    tree_dict = json.load(
        open(os.path.join(REF, "class_tree_tl_extended.json")))

    fmodel = HierarchicalSegmenter(
        tree=extended_tree, backbone=UNetBackbone(base_ch=64),
        hierarchical=True,
    )
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 36, 36, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(3), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    tmodel = ref_models.UNet(size=36, n_channels=3, hierarchy=tree_dict,
                             model_type=1)
    tmodel.eval()
    bp, bs = params["backbone"], stats["backbone"]
    _copy_double_conv(tmodel.inc0.conv, bp["inc"], bs["inc"])
    for i in range(1, 5):
        _copy_double_conv(
            getattr(tmodel, f"down{i}").mpconv[1], bp[f"down{i}"]["conv"],
            bs[f"down{i}"]["conv"])
        _copy_double_conv(
            getattr(tmodel, f"up{i}").conv, bp[f"up{i}"]["conv"],
            bs[f"up{i}"]["conv"])
    n_levels = extended_tree.num_levels
    for L in range(n_levels):
        k = np.asarray(params[f"head_l{L}"]["kernel"])
        tmodel.heads[L].conv.weight.data = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
        tmodel.heads[L].conv.bias.data = torch.from_numpy(
            np.asarray(params[f"head_l{L}"]["bias"]).copy())
    for L in range(1, n_levels):
        w = np.asarray(params[f"film_l{L}"]["mlp"]["kernel"])
        tmodel.films[L - 1].mlp[1].weight.data = torch.from_numpy(
            np.ascontiguousarray(w.T))
        tmodel.films[L - 1].mlp[1].bias.data = torch.from_numpy(
            np.asarray(params[f"film_l{L}"]["mlp"]["bias"]).copy())

    with torch.no_grad():
        t_probs, t_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), type=1,
            hierarchy=tree_dict)
    f_probs, f_logits, _ = fmodel.apply(variables, x, train=False)
    assert len(t_probs) == n_levels == len(f_probs)
    for L in range(n_levels):
        np.testing.assert_allclose(
            np.asarray(f_logits[L]), t_logits[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=3e-4, err_msg=f"logits level {L}")
        np.testing.assert_allclose(
            np.asarray(f_probs[L]), t_probs[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=3e-4, err_msg=f"probs level {L}")


def test_flat_unet_forward_parity(ref_models, default_tree):
    """Flat mode (model_type=0): one head over all leaves, identical weights
    (reference models.py:213-215 out_flat; :257-261 forward returns
    ``[], logits``). Pins the flat arm of the recipe table the same way the
    hierarchical tests pin the hier arm."""
    import json

    import jax
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )

    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    fmodel = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=64),
        hierarchical=False,
    )
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 36, 36, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(5), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    tmodel = ref_models.UNet(size=36, n_channels=3, hierarchy=tree_dict,
                             model_type=0)
    tmodel.eval()
    bp, bs = params["backbone"], stats["backbone"]
    _copy_double_conv(tmodel.inc0.conv, bp["inc"], bs["inc"])
    for i in range(1, 5):
        _copy_double_conv(
            getattr(tmodel, f"down{i}").mpconv[1], bp[f"down{i}"]["conv"],
            bs[f"down{i}"]["conv"])
        _copy_double_conv(
            getattr(tmodel, f"up{i}").conv, bp[f"up{i}"]["conv"],
            bs[f"up{i}"]["conv"])
    k = np.asarray(params["head_flat"]["kernel"])
    assert k.shape[-1] == default_tree.num_leaves == 7
    tmodel.out_flat.conv.weight.data = torch.from_numpy(
        np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    tmodel.out_flat.conv.bias.data = torch.from_numpy(
        np.asarray(params["head_flat"]["bias"]).copy())

    with torch.no_grad():
        t_probs, t_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), type=0,
            hierarchy=tree_dict)
    f_probs, f_logits, _ = fmodel.apply(variables, x, train=False)
    assert t_probs == [] and f_probs is None and len(f_logits) == 1
    np.testing.assert_allclose(
        np.asarray(f_logits[0]), t_logits.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=3e-4, err_msg="flat logits")
