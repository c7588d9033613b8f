"""StableHLO export: self-contained serving artifact (train/export.py).

The artifact must reproduce the exporting Predictor's outputs exactly (same
program), serve any batch size via the symbolic batch dim, carry a decoding
sidecar, and refuse the (runtime-weight) ensemble case.
"""
import json

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig


def _tiny_predictor(tmp_path, assets_dir, default_tree, monkeypatch,
                    outputs=("logits", "probs", "class_maps")):
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
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x, 0.0)
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
    return Predictor(cfg, ckpt, tree=default_tree, outputs=outputs)


def test_export_roundtrip_poly_batch(tmp_path, assets_dir, default_tree,
                                     monkeypatch):
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        export_predictor,
        load_exported,
    )

    pred = _tiny_predictor(tmp_path, assets_dir, default_tree, monkeypatch)
    path = export_predictor(pred, str(tmp_path / "model.stablehlo"))
    loaded = load_exported(path)

    # symbolic batch: one artifact, any batch
    for b in (1, 3):
        x = np.random.default_rng(b).normal(size=(b, 32, 32, 3)).astype(
            np.float32)
        want = pred(x)
        got = loaded(x)
        assert set(got) == set(want) == {"logits", "probs", "class_maps"}
        for lvl in range(2):
            np.testing.assert_array_equal(
                got["class_maps"][lvl], want["class_maps"][lvl])
            np.testing.assert_allclose(
                got["probs"][lvl], want["probs"][lvl], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                got["logits"][lvl], want["logits"][lvl], rtol=1e-5, atol=1e-6)

    meta = loaded.meta
    assert meta["batch"] == "symbolic"
    assert meta["img_size"] == 32
    assert meta["outputs"]["level_classes"][0] == [
        "background", "upper", "lower", "tooth"]
    assert meta["outputs"]["level_classes"][1] == [
        "pulp", "dentin", "enamel", "composite"]
    assert meta["artifact_bytes"] > 0


def test_export_static_batch_and_output_subset(tmp_path, assets_dir,
                                               default_tree, monkeypatch):
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        export_predictor,
        load_exported,
    )

    pred = _tiny_predictor(tmp_path, assets_dir, default_tree, monkeypatch,
                           outputs=("class_maps",))
    path = export_predictor(pred, str(tmp_path / "m.stablehlo"), batch=2)
    loaded = load_exported(path)
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = loaded(x)
    assert set(got) == {"class_maps"}
    np.testing.assert_array_equal(got["class_maps"][0],
                                  pred(x)["class_maps"][0])
    assert loaded.meta["batch"] == 2
    assert loaded.meta["outputs"]["keys"] == ["class_maps"]

    # static-batch artifact rejects other batch sizes
    with pytest.raises(Exception):
        loaded(np.zeros((3, 32, 32, 3), np.float32))


def _ensemble_predictor(tmp_path, assets_dir, default_tree, monkeypatch,
                        mesh=None, **pred_kw):
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
    x = np.zeros((1, 32, 32, 3), np.float32)
    ckpts = []
    for i in range(2):
        state, _ = create_train_state(
            small_model, jax.random.PRNGKey(i), x, 0.0)
        p = str(tmp_path / f"f{i}.ckpt")
        save_checkpoint(p, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                        test_measure_std=0.0)
        ckpts.append(p)
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)
    return Predictor(cfg, ckpts, tree=default_tree, mesh=mesh, **pred_kw)


def test_export_ensemble_roundtrip(tmp_path, assets_dir, default_tree,
                                   monkeypatch):
    """VERDICT r3 #7: the fold ensemble — the accuracy-best serving mode —
    exports as artifact + stacked-weights sidecar and reproduces the live
    Predictor exactly."""
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        export_predictor,
        load_exported,
    )

    pred = _ensemble_predictor(tmp_path, assets_dir, default_tree,
                               monkeypatch)
    path = export_predictor(pred, str(tmp_path / "ens.stablehlo"))
    assert (tmp_path / "ens.stablehlo.weights.npz").exists()
    loaded = load_exported(path)
    assert loaded.meta["ensemble"]["folds"] == 2

    for b in (1, 3):  # symbolic batch holds for the ensemble artifact too
        x = np.random.default_rng(b).normal(size=(b, 32, 32, 3)).astype(
            np.float32)
        want, got = pred(x), loaded(x)
        assert want["logits"] is None and got["logits"] is None
        for lvl in range(2):
            np.testing.assert_array_equal(
                got["class_maps"][lvl], want["class_maps"][lvl])
            np.testing.assert_allclose(
                got["probs"][lvl], want["probs"][lvl], rtol=1e-5, atol=1e-6)


def test_export_refuses_mesh_sharded_ensemble(tmp_path, assets_dir,
                                              default_tree, monkeypatch):
    import jax
    from jax.sharding import Mesh

    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        FOLD_AXIS,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        export_predictor,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), (FOLD_AXIS,))
    pred = _ensemble_predictor(tmp_path, assets_dir, default_tree,
                               monkeypatch, mesh=mesh)
    with pytest.raises(ValueError, match="mesh-sharded"):
        export_predictor(pred, str(tmp_path / "e.stablehlo"))


def test_export_tta_roundtrip(tmp_path, assets_dir, default_tree,
                              monkeypatch):
    """TTA bakes into the artifact: flip-averaged outputs, still symbolic
    batch; TTA of a constant-input forward equals the plain forward on a
    horizontally symmetric input."""
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        export_predictor,
        load_exported,
    )

    pred = _tiny_predictor(tmp_path, assets_dir, default_tree, monkeypatch)
    # fresh Predictor with tta=True over the same checkpoint
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )

    tta_pred = Predictor(pred.cfg, str(tmp_path / "best.ckpt"),
                         tree=default_tree, tta=True)
    path = export_predictor(tta_pred, str(tmp_path / "tta.stablehlo"))
    loaded = load_exported(path)
    x = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    want, got = tta_pred(x), loaded(x)
    for lvl in range(2):
        np.testing.assert_allclose(
            got["probs"][lvl], want["probs"][lvl], rtol=1e-5, atol=1e-6)
    # live TTA == manual two-view average of the plain predictor
    plain = pred(x)
    plain_flip = pred(x[:, :, ::-1])
    manual = 0.5 * (plain["probs"][1] + plain_flip["probs"][1][:, :, ::-1])
    np.testing.assert_allclose(want["probs"][1], manual, rtol=1e-5,
                               atol=1e-6)


def test_export_cli_flat_unet(tmp_path, assets_dir, monkeypatch):
    """CLI end-to-end on the real (small-image) flat UNet — no monkeypatched
    model: the artifact must decode without package model code."""
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.cli import (
        export as export_cli,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
        RunConfig,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        load_exported,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    tree = ClassTree.from_json(str(assets_dir / "class_tree_tl.json"),
                               str(assets_dir / "class_map.csv"))
    model = build_model(tree, model_select=0, model_type=0)
    x = np.zeros((1, 32, 32, 3), np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)

    out = str(tmp_path / "flat.stablehlo")
    export_cli.main([
        "--model-weights", ckpt, "--out", out,
        "--tree-root", str(assets_dir / "class_tree_tl.json"),
        "--class-map", str(assets_dir / "class_map.csv"),
        "--model-select", "0", "--model-type", "0", "--img-size", "32",
        "--outputs", "class_maps", "--batch", "poly",
    ])
    loaded = load_exported(out)
    got = loaded(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    # flat model: one leaf-level class map
    assert len(got["class_maps"]) == 1
    assert got["class_maps"][0].shape == (2, 32, 32)
    assert loaded.meta["outputs"]["level_classes"] == [[
        "background", "upper", "lower", "pulp", "dentin", "enamel",
        "composite"]]
    with open(out + ".json") as f:
        assert json.load(f)["model"]["quantized"] is False
