"""tools/flat_ckpt_permute.py exactness: a flat checkpoint re-keyed from the
default tree's leaf order to the extended tree's must produce BIT-IDENTICAL
leaf predictions (flat models are tree-independent up to channel order)."""
import os
import subprocess
import sys

import numpy as np
import jax

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flat_permute_exact(tmp_path, assets_dir):
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (  # noqa: E501
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (  # noqa: E501
        load_checkpoint,
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    t_def = ClassTree.from_json(str(assets_dir / "class_tree_tl.json"),
                                str(assets_dir / "class_map.csv"))
    t_ext = ClassTree.from_json(
        str(assets_dir / "class_tree_tl_extended.json"),
        str(assets_dir / "class_map_extended.csv"))

    model = build_model(t_def, model_select=0, model_type=0)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(7), x[:1], 0.0)
    src = tmp_path / "runs" / "fold_1" / "best.ckpt"
    os.makedirs(src.parent)
    save_checkpoint(str(src), state, epoch=3, loss=0.5,
                    test_measure_mean=0.9, test_measure_std=0.01)

    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools/flat_ckpt_permute.py"),
         "--runs-root", str(tmp_path / "runs"),
         "--out-root", str(tmp_path / "runs_ext"),
         "--model-select", "0", "--which", "best"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "runs_ext" / "fold_1" / "best.ckpt"
    st2, meta = load_checkpoint(str(out), state)
    assert meta["epoch"] == 3 and abs(meta["test_measure_mean"] - 0.9) < 1e-9

    v1 = {"params": state.params, "batch_stats": state.batch_stats}
    v2 = {"params": st2.params, "batch_stats": st2.batch_stats}
    z1 = model.apply(v1, x, train=False).logits_per_level[0]
    z2 = model.apply(v2, x, train=False).logits_per_level[0]
    perm = [t_def.leaf_names.index(n) for n in t_ext.leaf_names]
    np.testing.assert_array_equal(np.asarray(z1)[..., perm], np.asarray(z2))
