"""HRNet numerical parity vs the REFERENCE implementation (read-only oracle).

Builds a small HRNet in both frameworks, moves OUR Flax weights into the
reference's torch model using the donor-import name translation IN REVERSE
(which simultaneously proves the translation map covers the full HRNet), and
compares the hierarchical forward pass level by level.
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


class AttrDict(dict):
    def __getattr__(self, k):
        v = self[k]
        return AttrDict(v) if isinstance(v, dict) and not isinstance(v, AttrDict) else v


def small_cfg_dicts():
    """A 1-module width-8 HRNet topology, in both config dialects."""
    from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
        HRNetConfig,
        HRNetStage,
    )

    ours = HRNetConfig(
        stage1=HRNetStage(1, 1, "BOTTLENECK", (1,), (8,)),
        stage2=HRNetStage(1, 2, "BASIC", (1, 1), (8, 16)),
        stage3=HRNetStage(1, 3, "BASIC", (1, 1, 1), (8, 16, 32)),
        stage4=HRNetStage(1, 4, "BASIC", (1, 1, 1, 1), (8, 16, 32, 64)),
    )
    stage = lambda m, b, blocks, chans, blk: AttrDict(
        NUM_MODULES=m, NUM_BRANCHES=b, BLOCK=blk, NUM_BLOCKS=blocks,
        NUM_CHANNELS=chans, FUSE_METHOD="SUM")
    theirs = AttrDict(MODEL=AttrDict(
        ALIGN_CORNERS=True,
        EXTRA=AttrDict(
            FINAL_CONV_KERNEL=1,
            STAGE1=stage(1, 1, [1], [8], "BOTTLENECK"),
            STAGE2=stage(1, 2, [1, 1], [8, 16], "BASIC"),
            STAGE3=stage(1, 3, [1, 1, 1], [8, 16, 32], "BASIC"),
            STAGE4=stage(1, 4, [1, 1, 1, 1], [8, 16, 32, 64], "BASIC"),
        )))
    return ours, theirs


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REF)
    for name, mod in (("timm", {}), ("timm.models", {}),
                      ("timm.models.vision_transformer", {"_cfg": lambda *a, **k: {}})):
        m = types.ModuleType(name)
        for k, v in mod.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
    sys.modules["timm"].models = sys.modules["timm.models"]
    sys.modules["timm.models"].vision_transformer = sys.modules[
        "timm.models.vision_transformer"]
    from Models import models as ref_models

    return ref_models


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        out.update(_flatten(v, p) if isinstance(v, dict) else {p: v})
    return out


def test_hier_hrnet_forward_parity(ref_models, default_tree):
    import jax
    import json
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.torch_import import (
        translate_flax_path,
    )

    ours_cfg, theirs_cfg = small_cfg_dicts()
    fmodel = HierarchicalSegmenter(
        tree=default_tree, backbone=HRNetBackbone(config=ours_cfg),
        hierarchical=True, final_conv_kernel=1, align_corners=True,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), x, train=False)

    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    tmodel = ref_models.HighResolutionNet(
        config=theirs_cfg, hierarchy=tree_dict, model_type=1
    )
    tmodel.eval()

    # Reverse donor-import: flax leaf -> torch key via the translation map.
    sd = {}
    unmapped = []
    for coll in ("params", "batch_stats"):
        for path, v in _flatten(variables[coll]).items():
            a = np.asarray(v)
            if path[-1] == "kernel":
                a = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a.T
            cands = translate_flax_path(path, coll, model_select=1)
            # backbone leaves must all translate; heads/film are mapped by hand
            name = "/".join(path)
            if cands:
                sd[cands[0]] = torch.from_numpy(np.ascontiguousarray(a))
            elif name.startswith(("head_l", "film_l")):
                continue
            else:
                unmapped.append(name)
    assert not unmapped, f"untranslated backbone leaves: {unmapped[:8]}"

    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    # everything except torch bookkeeping + (hand-copied below) heads/films
    # must have been covered by the translation map
    allowed = [k for k in missing
               if k.endswith("num_batches_tracked")
               or k.startswith(("classifiers.", "films."))]
    assert sorted(allowed) == sorted(missing), (
        f"translation map left real gaps: "
        f"{[k for k in missing if k not in allowed][:8]}")
    assert not unexpected, unexpected[:8]

    params = variables["params"]
    for L in range(2):
        k = np.asarray(params[f"head_l{L}"]["kernel"])
        tmodel.classifiers[L].weight.data = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
        tmodel.classifiers[L].bias.data = torch.from_numpy(
            np.asarray(params[f"head_l{L}"]["bias"]).copy())
    w = np.asarray(params["film_l1"]["mlp"]["kernel"])
    tmodel.films[0].mlp[1].weight.data = torch.from_numpy(
        np.ascontiguousarray(w.T))
    tmodel.films[0].mlp[1].bias.data = torch.from_numpy(
        np.asarray(params["film_l1"]["mlp"]["bias"]).copy())

    with torch.no_grad():
        t_probs, t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_probs, f_logits, _ = fmodel.apply(variables, x, train=False)
    for L in range(2):
        np.testing.assert_allclose(
            np.asarray(f_logits[L]), t_logits[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=5e-4, err_msg=f"logits level {L}")
        np.testing.assert_allclose(
            np.asarray(f_probs[L]), t_probs[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=5e-4, err_msg=f"probs level {L}")


def test_hier_hrnet_TRAIN_mode_parity_incl_running_stats(
    ref_models, default_tree
):
    """Train-mode parity (VERDICT r1 item #7): batch-stats normalization path
    AND the BN running statistics after one step.

    The reference re-runs the backbone once per level (models.py:773), so
    torch's BN EMAs update D=2 times per forward; our shared-backbone model
    updates once and ``bn_ema_correction`` restores the D-times value. With
    LeanBatchNorm storing torch's unbiased running variance, every running
    mean/var leaf must match the torch model's bit-for-bit (fp tolerance).
    """
    import jax
    import json
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.norm import (
        BN_MOMENTUM,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        bn_ema_correction,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.torch_import import (
        translate_flax_path,
    )

    ours_cfg, theirs_cfg = small_cfg_dicts()
    fmodel = HierarchicalSegmenter(
        tree=default_tree, backbone=HRNetBackbone(config=ours_cfg),
        hierarchical=True, final_conv_kernel=1, align_corners=True,
    )
    assert fmodel.bn_updates_per_step == 2
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(1), x, train=False)
    # non-trivial initial running stats so the EMA has something to decay
    variables = jax.tree_util.tree_map(lambda v: v, variables)  # unfreeze-safe
    import flax

    bs = flax.core.unfreeze(variables["batch_stats"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["batch_stats"])

    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    tmodel = ref_models.HighResolutionNet(
        config=theirs_cfg, hierarchy=tree_dict, model_type=1
    )

    sd = {}
    for coll in ("params", "batch_stats"):
        for path, v in _flatten(variables[coll]).items():
            a = np.asarray(v)
            if path[-1] == "kernel":
                a = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a.T
            cands = translate_flax_path(path, coll, model_select=1)
            if cands:
                sd[cands[0]] = torch.from_numpy(np.ascontiguousarray(a))
    tmodel.load_state_dict(sd, strict=False)
    params = variables["params"]
    for L in range(2):
        k = np.asarray(params[f"head_l{L}"]["kernel"])
        tmodel.classifiers[L].weight.data = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
        tmodel.classifiers[L].bias.data = torch.from_numpy(
            np.asarray(params[f"head_l{L}"]["bias"]).copy())
    w = np.asarray(params["film_l1"]["mlp"]["kernel"])
    tmodel.films[0].mlp[1].weight.data = torch.from_numpy(
        np.ascontiguousarray(w.T))
    tmodel.films[0].mlp[1].bias.data = torch.from_numpy(
        np.asarray(params["film_l1"]["mlp"]["bias"]).copy())

    # ---- torch train-mode forward: D=2 natural EMA updates ----------------
    tmodel.train()
    with torch.no_grad():
        t_probs, t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    # ---- ours: one shared pass + closed-form D-times correction -----------
    (f_probs, f_logits, _), upd = fmodel.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    new_stats = bn_ema_correction(
        variables["batch_stats"], upd["batch_stats"], BN_MOMENTUM, 2
    )

    for L in range(2):
        np.testing.assert_allclose(
            np.asarray(f_logits[L]), t_logits[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=5e-4, err_msg=f"train-mode logits level {L}")
        np.testing.assert_allclose(
            np.asarray(f_probs[L]), t_probs[L].permute(0, 2, 3, 1).numpy(),
            rtol=2e-3, atol=5e-4, err_msg=f"train-mode probs level {L}")

    # ---- every running mean/var leaf vs the torch model -------------------
    t_sd = tmodel.state_dict()
    checked = 0
    for path, v in _flatten(new_stats).items():
        cands = translate_flax_path(path, "batch_stats", model_select=1)
        if not cands:
            continue
        torch_v = t_sd[cands[0]].numpy()
        np.testing.assert_allclose(
            np.asarray(v), torch_v, rtol=1e-4, atol=1e-5,
            err_msg="/".join(path),
        )
        checked += 1
    assert checked > 50  # the whole backbone's BNs were compared


def test_flat_hrnet_forward_parity(ref_models, default_tree):
    """Flat mode (model_type=0): single ``classifier`` head over all leaves,
    bilinear-upsampled to input size (reference models.py:754-758), identical
    weights via the reverse donor-import translation. Pins the flat arm of
    the recipe table for the HRNet backbone."""
    import json

    import jax
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.torch_import import (
        translate_flax_path,
    )

    ours_cfg, theirs_cfg = small_cfg_dicts()
    fmodel = HierarchicalSegmenter(
        tree=default_tree, backbone=HRNetBackbone(config=ours_cfg),
        hierarchical=False, final_conv_kernel=1, align_corners=True,
    )
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(9), x, train=False)

    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    tmodel = ref_models.HighResolutionNet(
        config=theirs_cfg, hierarchy=tree_dict, model_type=0
    )
    tmodel.eval()

    sd = {}
    unmapped = []
    for coll in ("params", "batch_stats"):
        for path, v in _flatten(variables[coll]).items():
            a = np.asarray(v)
            if path[-1] == "kernel":
                a = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a.T
            cands = translate_flax_path(path, coll, model_select=1)
            name = "/".join(path)
            if name.startswith("head_flat"):
                continue  # hand-copied below (torch name: ``classifier``)
            if cands:
                sd[cands[0]] = torch.from_numpy(np.ascontiguousarray(a))
            else:
                unmapped.append(name)
    assert not unmapped, f"untranslated backbone leaves: {unmapped[:8]}"

    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    allowed = [k for k in missing
               if k.endswith("num_batches_tracked")
               or k.startswith("classifier.")]
    assert sorted(allowed) == sorted(missing), (
        f"translation map left real gaps: "
        f"{[k for k in missing if k not in allowed][:8]}")
    assert not unexpected, unexpected[:8]

    params = variables["params"]
    k = np.asarray(params["head_flat"]["kernel"])
    assert k.shape[-1] == default_tree.num_leaves == 7
    tmodel.classifier.weight.data = torch.from_numpy(
        np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    tmodel.classifier.bias.data = torch.from_numpy(
        np.asarray(params["head_flat"]["bias"]).copy())

    with torch.no_grad():
        t_probs, t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_probs, f_logits, _ = fmodel.apply(variables, x, train=False)
    assert t_probs == [] and f_probs is None and len(f_logits) == 1
    np.testing.assert_allclose(
        np.asarray(f_logits[0]), t_logits.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=5e-4, err_msg="flat logits")
