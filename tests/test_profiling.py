"""Profiler-hook test: --profile-dir writes a jax trace during epoch 2."""
import glob
import os

import numpy as np


def test_profile_dir_writes_trace(tmp_path, assets_dir, monkeypatch):
    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
        RunConfig,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )

    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.loop."
        "build_model",
        lambda tree, *a, **k: H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
        ),
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    root = str(tmp_path / "d")
    write_synth_dataset(root, 4, size=80, seed=0, folds=1)
    prof = str(tmp_path / "prof")
    cfg = RunConfig(
        save_path=str(tmp_path / "run"), data_root=root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=32, epochs=2, batch_size=2,
        val_batch=1, num_workers=2, inc_cross_val=True, folds=1,
        profile_dir=prof,
    )
    train(cfg)
    traces = glob.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace written under {prof}"
