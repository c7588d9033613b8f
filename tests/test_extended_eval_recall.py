"""Depth-4 eval-mode recall floor (VERDICT r4 next-round item #7).

Recipe-shaped guard: short hierarchical training on synthetic data under the
EXTENDED depth-4 tree, then offline eval (``predict_eval`` — running-stats BN,
the mode users deploy) must report per-class recall above a floor for BOTH
level-0 classes. A train/eval forward divergence concentrated in the 2-class
level-0 head — the failure mode round 4's recipe tables appeared to show
(tooth+alveolar recall 0.013 across all 5 folds while train-mode dice read
0.98) — can never ship silently again.

Scope note: the r4 collapse turned out to be a TPU-only metric-soundness bug
(duplicated bf16 producer in the first-max self-comparison;
``tests/test_tpu_eval_consistency.py`` is the backend-level guard and this
file's floor assertion re-arms it on real TPU runs). THIS test runs on any
backend and guards the model-behavior half of the hypothesis space: BN
running-stats drift at depth 4 (the m**D ``bn_ema_correction`` closed form),
eval-mode composition, and level-weight starvation of the binary L0 head —
each of which would surface here as a collapsed eval-mode recall with healthy
train-mode metrics, exactly like the original signature.
"""
import numpy as np

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)


def test_depth4_eval_mode_l0_recall_floor(tmp_path, assets_dir, extended_tree,
                                          monkeypatch):
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (  # noqa: E501
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
    from restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate import (  # noqa: E501
        predict_eval,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    root = str(tmp_path / "data")
    write_synth_dataset(root, 8, size=96, seed=3, folds=1)
    cfg = RunConfig(
        save_path=str(tmp_path / "run"),
        data_root=root,
        tree_root=str(assets_dir / "class_tree_tl_extended.json"),
        class_map=str(assets_dir / "class_map_extended.csv"),
        model_select=0, model_type=1, img_size=48, epochs=10, batch_size=2,
        val_batch=2, lr=3e-3, num_workers=2, inc_cross_val=True, folds=1,
        level0_pretrain_epochs=None,
    )
    results = train(cfg)
    assert results[0] is not None

    res = predict_eval(
        cfg,
        weights=[str(tmp_path / "run" / "best.ckpt")
                 if (tmp_path / "run" / "best.ckpt").exists()
                 else str(tmp_path / "run" / "fold_1" / "best.ckpt")],
        roots=[f"{root}/fold_1/val"],
        save_root=str(tmp_path / "pred"),
    )
    per_class = res[0]["per_class"]
    assert len(per_class) == 11  # 2 + 2 + 4 + 3 extended classes
    # level 0 = [Background, Tooth+alveolar]: the gate for the whole tree.
    # The r4 tables' signature was recall 0.013 with precision 0.99 here; a
    # barely-learning 10-epoch toy model still clears 0.5 with margin, while
    # any L0 eval-mode collapse lands at ~0.
    l0_recalls = [per_class[0]["recall"], per_class[1]["recall"]]
    assert min(l0_recalls) > 0.5, (
        f"eval-mode level-0 recall collapsed: {l0_recalls} "
        "(train/eval forward divergence or metric-path regression)"
    )
    # and the deeper levels were actually trained/scored (not masked away)
    assert np.mean([m["recall"] for m in per_class]) > 0.2
