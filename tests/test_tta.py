"""Horizontal-flip test-time augmentation (train/evaluate.py tta_apply)."""
import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.models import (
    hierarchical as H,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (  # noqa: E501
    UNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate import (
    tta_apply,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
    create_train_state,
)


@pytest.fixture(scope="module")
def model_and_vars(default_tree):
    import jax

    model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x[:1], 0.0)
    return model, {"params": state.params,
                   "batch_stats": state.batch_stats}, x


class TestTTA:
    def test_is_mean_of_views(self, model_and_vars):
        model, variables, x = model_and_vars
        plain = model.apply(variables, x, train=False)
        flipped = model.apply(variables, x[:, :, ::-1], train=False)
        tta = tta_apply(model.apply)(variables, x, train=False)
        for lvl in range(2):
            expect = 0.5 * (
                np.asarray(plain.logits_per_level[lvl])
                + np.asarray(flipped.logits_per_level[lvl])[:, :, ::-1]
            )
            np.testing.assert_allclose(
                np.asarray(tta.logits_per_level[lvl]), expect,
                rtol=1e-5, atol=1e-6)
            expect_p = 0.5 * (
                np.asarray(plain.probs_per_level[lvl])
                + np.asarray(flipped.probs_per_level[lvl])[:, :, ::-1]
            )
            np.testing.assert_allclose(
                np.asarray(tta.probs_per_level[lvl]), expect_p,
                rtol=1e-5, atol=1e-6)

    def test_predict_eval_cli_flag(self, tmp_path, assets_dir, monkeypatch):
        """e2e: --tta True through the Evaluator (tiny model, synth data)."""
        import jax

        from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (  # noqa: E501
            RunConfig,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (  # noqa: E501
            write_synth_dataset,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
            ClassTree,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train import (
            evaluate as EV,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (  # noqa: E501
            save_checkpoint,
        )

        data = str(tmp_path / "d")
        write_synth_dataset(data, 4, size=48, seed=9, folds=1)
        tree = ClassTree.from_json(str(assets_dir / "class_tree_tl.json"),
                                   str(assets_dir / "class_map.csv"))
        small = H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True)
        monkeypatch.setattr(EV, "build_model", lambda *a, **k: small)
        x = np.zeros((1, 32, 32, 3), np.float32)
        state, _ = create_train_state(small, jax.random.PRNGKey(0), x, 0.0)
        ckpt = str(tmp_path / "best.ckpt")
        save_checkpoint(ckpt, state, epoch=1, loss=0.0,
                        test_measure_mean=0.5, test_measure_std=0.0)
        cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                        class_map=str(assets_dir / "class_map.csv"),
                        model_select=0, model_type=1, img_size=32,
                        val_batch=2, tta=True, num_workers=2)
        ev = EV.Evaluator(cfg, tree, f"{data}/fold_1/val", ckpt,
                          save_dir=None, save_images=False)
        res = ev.run()
        assert np.isfinite(res["overall"]["dice"])
