"""Serving predictor: weight-baked compiled inference matches the eval path."""
import glob
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)


def test_predictor_roundtrip(tmp_path, assets_dir, default_tree, monkeypatch):
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    small_model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x[:1], 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)

    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)
    pred = Predictor(cfg, ckpt, tree=default_tree)
    pred.warmup(batch=2)
    out = pred(x)
    assert len(out["class_maps"]) == 2
    assert out["class_maps"][0].shape == (2, 32, 32)
    assert out["class_maps"][0].dtype == np.int32
    assert out["probs"][1].shape == (2, 32, 32, 4)

    # parity vs direct eval apply
    direct = small_model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x,
        train=False,
    )
    np.testing.assert_allclose(
        out["logits"][0], np.asarray(direct.logits_per_level[0]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        out["class_maps"][1],
        np.argmax(np.asarray(direct.logits_per_level[1]), -1),
    )


def test_fold_ensemble_predictor(tmp_path, assets_dir, default_tree,
                                 monkeypatch):
    """Ensemble = fold-mean of composed probabilities, one vmapped program."""
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    small_model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)

    # two "folds" with different weights, in the run-dir layout
    ckpts = []
    for fold, seed in ((1, 0), (2, 7)):
        state, _ = create_train_state(
            small_model, jax.random.PRNGKey(seed), x[:1], 0.0)
        d = tmp_path / f"fold_{fold}"
        d.mkdir()
        p = str(d / "best.ckpt")
        save_checkpoint(p, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                        test_measure_std=0.0)
        ckpts.append(p)

    assert Predictor.fold_checkpoints(str(tmp_path)) == ckpts

    ens = Predictor(cfg, ckpts, tree=default_tree)
    out = ens(x)
    assert out["logits"] is None
    assert out["class_maps"][0].shape == (2, 32, 32)

    # fold-mean of the single-fold predictors' probs, exactly
    singles = [Predictor(cfg, p, tree=default_tree)(x) for p in ckpts]
    for lvl in range(2):
        mean = np.mean([s["probs"][lvl] for s in singles], axis=0)
        np.testing.assert_allclose(out["probs"][lvl], mean,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(out["class_maps"][lvl],
                                      np.argmax(mean, -1))

    # quantize + ensemble is refused loudly
    with pytest.raises(ValueError, match="ensemble"):
        Predictor(cfg, ckpts, tree=default_tree, quantize=True)


def test_predictor_output_selection(tmp_path, assets_dir, default_tree,
                                    monkeypatch):
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    small_model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    x = np.random.default_rng(2).normal(size=(1, 32, 32, 3)).astype(np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)
    lean = Predictor(cfg, ckpt, tree=default_tree, outputs=("class_maps",))
    out = lean(x)
    assert set(out) == {"class_maps"}
    full = Predictor(cfg, ckpt, tree=default_tree)(x)
    for a, b in zip(out["class_maps"], full["class_maps"]):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="unknown"):
        Predictor(cfg, ckpt, tree=default_tree, outputs=("banana",))


def test_u8_io_and_compact_class_maps(tmp_path, assets_dir, default_tree,
                                      monkeypatch):
    """The measured batch-1 levers (tools/serving_latency_b1.py): raw uint8
    inputs normalized ON DEVICE and uint8 class maps must agree with the
    host-normalized f32 path exactly (same f32 arithmetic either side)."""
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    small_model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    rng = np.random.default_rng(7)
    raw_gray = rng.integers(0, 256, (2, 32, 32), np.uint8)
    raw_color = rng.integers(0, 256, (2, 32, 32, 3), np.uint8)
    x = np.zeros((1, 32, 32, 3), np.float32)
    state, _ = create_train_state(
        small_model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)

    pred = Predictor(cfg, ckpt, tree=default_tree)
    pred_u8 = Predictor(cfg, ckpt, tree=default_tree,
                        class_map_dtype="uint8")
    pred_u8.warmup(batch=2, input_dtype="uint8")

    for raw in (raw_gray, raw_color):
        # host-normalized reference: exactly the training Normalize(.5,.5)
        f = raw.astype(np.float32) / 255.0
        if f.ndim == 3:
            f = np.repeat(f[..., None], 3, axis=-1)
        f = (f - 0.5) / 0.5
        ref = pred(f)
        got = pred_u8(raw)
        for lvl in range(2):
            np.testing.assert_allclose(
                got["probs"][lvl], ref["probs"][lvl], rtol=1e-5, atol=1e-6)
            assert got["class_maps"][lvl].dtype == np.uint8
            np.testing.assert_array_equal(
                got["class_maps"][lvl],
                ref["class_maps"][lvl].astype(np.uint8))

    with pytest.raises(ValueError, match="int32.*uint8|uint8.*int32"):
        Predictor(cfg, ckpt, tree=default_tree, class_map_dtype="int16")
