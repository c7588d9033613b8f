"""Depth-4 extended-tree end-to-end smoke (BASELINE.json config #5): train the
hierarchical model on the extended class tree, then predict/eval — exercising
multi-group grouped softmax, 4-deep composition, and deep ternary targets."""
import csv
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)


def test_extended_tree_train_and_eval(tmp_path, assets_dir, extended_tree,
                                      monkeypatch):
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

    root = str(tmp_path / "data")
    write_synth_dataset(root, 6, size=96, seed=0, folds=1)
    cfg = RunConfig(
        save_path=str(tmp_path / "run"),
        data_root=root,
        tree_root=str(assets_dir / "class_tree_tl_extended.json"),
        class_map=str(assets_dir / "class_map_extended.csv"),
        model_select=0, model_type=1, img_size=32, epochs=1, batch_size=2,
        val_batch=1, lr=1e-3, num_workers=2, inc_cross_val=True, folds=1,
        level0_pretrain_epochs=None,
    )
    results = train(cfg)
    assert len(results) == 1 and results[0] is not None
    with open(tmp_path / "run" / "fold_1" / "metrics.csv") as f:
        rows = list(csv.reader(f))
    # level losses for all four depths recorded
    import ast

    lvl = ast.literal_eval(rows[1][2])
    assert len(lvl) == 4

    res = predict_eval(
        cfg,
        weights=[str(tmp_path / "run" / "fold_1" / "best.ckpt")],
        roots=[os.path.join(root, "fold_1", "val")],
        save_root=str(tmp_path / "pred"),
    )
    # full extended class set scored: 2+2+4+3 = 11 classes
    assert len(res[0]["per_class"]) == 11


def test_extended_tree_level0_pretrain_schedule():
    cfg = RunConfig(level0_pretrain_epochs=3)
    masks = [cfg.level_mask_for_epoch(e, 4) for e in (1, 3, 6, 9, 30)]
    assert masks[0] == [1, 0, 0, 0]
    assert masks[1] == [1, 1, 0, 0]
    assert masks[2] == [1, 1, 1, 0]
    assert masks[3] == [1, 1, 1, 1]
    assert masks[4] == [1, 1, 1, 1]
