"""End-to-end smoke tests: full train loop on synthetic data (loss decreases,
checkpoints and metrics.csv written), offline predict/eval including the
flat-model hierarchy reconstruction, and the agreement CLI."""
import csv
import glob
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    write_synth_dataset(str(root), 8, size=96, seed=0, folds=2)
    return str(root)


def _cfg(root, save, assets_dir, **kw):
    defaults = dict(
        save_path=save,
        data_root=root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0,
        model_type=1,
        img_size=32,
        epochs=2,
        batch_size=2,
        val_batch=1,
        lr=1e-3,
        num_workers=2,
        inc_cross_val=True,
        folds=2,
        seed=0,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def test_train_loop_all_folds(tmp_path, synth_root, assets_dir, monkeypatch):
    # shrink the UNet for test speed
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )

    orig = H.build_model

    def small(tree, model_select, model_type, *args, **kwargs):
        import jax.numpy as jnp

        return H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8),
            hierarchical=model_type == 1,
        )

    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.loop.build_model",
        small,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    cfg = _cfg(synth_root, str(tmp_path / "run"), assets_dir,
               save_images_batch=True, save_images_batch_num=1)
    results = train(cfg)
    assert len(results) == 2  # BOTH folds trained (reference defect #2 fixed)
    for fold in (1, 2):
        d = tmp_path / "run" / f"fold_{fold}"
        assert (d / "best.ckpt").exists()
        assert (d / "last.ckpt").exists()
        with open(d / "metrics.csv") as f:
            rows = list(csv.reader(f))
        assert rows[0][0] == "Epoch"
        assert len(rows) == 3  # header + 2 epochs
        assert float(rows[1][1]) > 0  # train loss present
    # image dumps
    imgs = glob.glob(str(tmp_path / "run" / "fold_1" / "images" / "*" / "*.png"))
    assert imgs


def test_predict_eval_hier_and_flat(tmp_path, synth_root, assets_dir, monkeypatch):
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )

    def small(tree, model_select, model_type, *args, **kwargs):
        return H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8),
            hierarchical=model_type == 1,
        )

    for mod in ("loop", "evaluate"):
        monkeypatch.setattr(
            f"restrictive_hierarchical_semantic_segmentation_tpu.train.{mod}."
            "build_model",
            small,
        )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate import (
        predict_eval,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    for model_type in (1, 0):
        run = str(tmp_path / f"run{model_type}")
        cfg = _cfg(synth_root, run, assets_dir, model_type=model_type,
                   epochs=1, folds=1)
        train(cfg)
        res = predict_eval(
            cfg,
            weights=[os.path.join(run, "fold_1", "best.ckpt")],
            roots=[os.path.join(synth_root, "fold_1", "val")],
            save_root=str(tmp_path / f"pred{model_type}"),
        )
        assert len(res) == 1
        # scored on the full hierarchical class set in BOTH modes
        assert len(res[0]["per_class"]) == 8
        csv_path = tmp_path / f"pred{model_type}" / "fold_1" / "metrics.csv"
        assert csv_path.exists()
        dumps = glob.glob(str(tmp_path / f"pred{model_type}" / "fold_1" / "0" / "*"))
        assert dumps


def test_batched_eval_identical_to_batch1(tmp_path, synth_root, assets_dir,
                                          monkeypatch):
    """Offline eval at val_batch>1 (incl. a padded ragged last batch) must
    produce the exact per-class metrics of the reference's batch=1 loop —
    per-image confusion matrices make the batching invisible to the scores."""
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )

    def small(tree, model_select, model_type, *args, **kwargs):
        return H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8),
            hierarchical=model_type == 1,
        )

    for mod in ("loop", "evaluate"):
        monkeypatch.setattr(
            f"restrictive_hierarchical_semantic_segmentation_tpu.train.{mod}."
            "build_model",
            small,
        )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate import (
        predict_eval,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    for model_type in (1, 0):
        run = str(tmp_path / f"runb{model_type}")
        cfg = _cfg(synth_root, run, assets_dir, model_type=model_type,
                   epochs=1, folds=1)
        train(cfg)
        weights = [os.path.join(run, "fold_1", "best.ckpt")]
        roots = [os.path.join(synth_root, "fold_1", "val")]
        res1 = predict_eval(cfg, weights, roots, save_root="",
                            save_images=False)
        # 3 does not divide the val set size -> exercises the padded tail
        cfg_b = _cfg(synth_root, run, assets_dir, model_type=model_type,
                     epochs=1, folds=1, val_batch=3)
        res3 = predict_eval(cfg_b, weights, roots, save_root="",
                            save_images=False)
        for m1, m3 in zip(res1[0]["per_class"], res3[0]["per_class"]):
            for k in m1:
                np.testing.assert_allclose(m3[k], m1[k], rtol=1e-6,
                                           err_msg=f"{model_type} {k}")
        np.testing.assert_allclose(res3[0]["measure"], res1[0]["measure"],
                                   rtol=1e-6)


def test_flat_reconstruction_exactness(default_tree):
    """Parent channels must equal the union of descendant leaf predictions."""
    from restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate import (
        reconstruct_levels_from_leaves,
    )

    rng = np.random.default_rng(0)
    leaf_cls = rng.integers(0, 7, (2, 8, 8))
    leaf_oh = np.eye(7, dtype=np.float32)[leaf_cls]
    levels = reconstruct_levels_from_leaves(leaf_oh, default_tree)
    assert [l.shape[-1] for l in levels] == [4, 4]
    tooth = levels[0][..., 3]
    want = (leaf_cls >= 3).astype(np.float32)  # any of pulp..composite
    np.testing.assert_array_equal(tooth, want)
    np.testing.assert_array_equal(levels[1], leaf_oh[..., 3:])
    np.testing.assert_array_equal(levels[0][..., 0], leaf_oh[..., 0])


def test_agreement_cli(tmp_path):
    import cv2

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.agreement import (
        agreement_from_masks,
        run_agreement,
    )

    a = np.zeros((32, 32), np.uint8)
    a[8:24, 8:24] = 255
    b = np.zeros((32, 32), np.uint8)
    b[8:24, 12:28] = 255
    agr, fn, fp = agreement_from_masks(a, b)
    # areas: ref(a)=256, test(b)=256, overlap=192, total=320
    np.testing.assert_allclose(fn, (320 - 256) / 256)
    np.testing.assert_allclose(fp, (320 - 256) / 256)
    np.testing.assert_allclose(agr, 1 - 0.25)
    # reference quirk (AgreementModule.py:67-68): fn==0 and fp==0 (identical
    # or both-empty masks) forces agreement to 0 — replicated for parity
    agr2, _, _ = agreement_from_masks(a, a)
    np.testing.assert_allclose(agr2, 0.0)

    # file-level driver smoke: 1 patient, AP12 only
    pred_dir = tmp_path / "preds"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir(), gt_dir.mkdir()
    names = ["AP12A", "AP12P", "AP40A", "AP40P", "AP100A", "AP100P",
             "AP200A", "AP200P"]
    for series in ("Td", "Rd"):
        for n in names:
            cv2.imwrite(str(pred_dir / f"z1{series}-{n}.png"), a)
        cv2.imwrite(str(gt_dir / f"z1{series}-OFR200.png"), b)
    rep = run_agreement(str(pred_dir), str(gt_dir), ["OFR200"], ap_only=True)
    vals = rep["OFR200"]["agreement"]["AP12"]
    np.testing.assert_allclose(vals[0], 0.75)


def test_agreement_cli_main_argv(tmp_path):
    """Full CLI entry with the reference's stringly flags (argv path)."""
    import cv2

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.agreement import (
        main,
    )

    a = np.zeros((16, 16), np.uint8)
    a[2:10, 2:10] = 255
    b = np.zeros((16, 16), np.uint8)
    b[2:10, 4:12] = 255
    pred_dir = tmp_path / "p"
    gt_dir = tmp_path / "g"
    pred_dir.mkdir(), gt_dir.mkdir()
    for series in ("Td", "Rd"):
        for n in ("AP12A", "AP12P", "AP40A", "AP40P", "AP100A", "AP100P",
                  "AP200A", "AP200P"):
            cv2.imwrite(str(pred_dir / f"z1{series}-{n}.png"), a)
        cv2.imwrite(str(gt_dir / f"z1{series}-OFR200.png"), b)
    rep = main([
        "--mask-root", str(pred_dir), "--ofr-gt-masks", str(gt_dir),
        "--list-of-ofr", "['OFR200']", "--ap-only", "True",
        "--conf-intervals", "True",
    ])
    assert "OFR200" in rep and "AP12" in rep["OFR200"]["agreement"]


def test_trainer_donor_pth_load_path(tmp_path, synth_root, assets_dir,
                                     monkeypatch):
    """--model-weights <.pth> routes through the torch donor importer inside
    the Trainer build (train.py:470-505 capability), end-to-end."""
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )

    def small(tree, model_select, model_type, *args, **kwargs):
        return H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8),
            hierarchical=model_type == 1,
        )

    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.loop."
        "build_model",
        small,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        Trainer,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )

    donor = {"inc.double_conv.0.weight": torch.full((8, 3, 3, 3), 0.25),
             "inc.double_conv.0.bias": torch.full((8,), 0.5)}
    pth = str(tmp_path / "donor.pth")
    torch.save(donor, pth)

    tree = ClassTree.from_json(str(assets_dir / "class_tree_tl.json"),
                               str(assets_dir / "class_map.csv"))
    cfg = _cfg(synth_root, str(tmp_path / "run"), assets_dir, epochs=1,
               folds=1, model_weights=pth)
    tr = Trainer(cfg, tree, os.path.join(synth_root, "fold_1", "train"),
                 os.path.join(synth_root, "fold_1", "val"),
                 str(tmp_path / "run"))
    k = np.asarray(tr.state.params["backbone"]["inc"]["conv0"]["kernel"])
    np.testing.assert_allclose(k, 0.25)
    np.testing.assert_allclose(
        np.asarray(tr.state.params["backbone"]["inc"]["conv0"]["bias"]), 0.5)


def test_agreement_reproducibility(tmp_path):
    """Test/retest reproducibility table (the reference's commented-out
    block, AgreementModule.py:121-187, implemented for real; opt-in)."""
    import cv2

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.agreement import (
        run_reproducibility,
    )

    d = tmp_path / "preds"
    d.mkdir()
    rng = np.random.default_rng(0)
    slot_names = [
        "ap12a", "ap12p", "ap40a", "ap40p", "ap100a", "ap100p", "ap200a",
        "ap200p", "iso100", "iso200", "iso300", "iso400", "ofc40", "ofr200",
        "tscanA", "tscanB",
    ]
    for pat in ("z1", "z2"):
        for s, name in enumerate(slot_names):
            base = np.zeros((32, 32), np.uint8)
            base[4:20, 4:20] = 255
            shifted = np.zeros((32, 32), np.uint8)
            shifted[4:20, 8:24] = 255
            cv2.imwrite(str(d / f"{pat}Td-{name}.png"), base)
            cv2.imwrite(str(d / f"{pat}Rd-{name}.png"), shifted)
    report = run_reproducibility(str(d))
    assert set(report) == {
        "AP12", "AP40", "AP100", "AP200", "ISO100", "ISO200", "ISO300",
        "ISO400", "OFC", "OFR", "TSCAN100",
    }
    # identical geometry in every slot: agreement = 1 - (fn+fp)/2 with
    # ref=256, test=256, overlap=192 -> fn=fp=0.25 -> 0.75 (cf.
    # test_agreement_cli's arithmetic)
    for v in report.values():
        np.testing.assert_allclose(v, 0.75)
