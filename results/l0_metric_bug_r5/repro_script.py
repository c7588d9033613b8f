"""Run the REAL make_eval_step on TPU; print raw L0 cm per batch.
Also rerun probe-1's exact program to confirm its bad cm reproduces."""
import os, sys
sys.path.insert(0, '/root/repo')
import jax
from restrictive_hierarchical_semantic_segmentation_tpu.utils.compile_cache import enable
enable()
import jax.numpy as jnp
import numpy as np, ast
from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import SegDataset
from restrictive_hierarchical_semantic_segmentation_tpu.data.loader import BatchLoader
from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import ClassTree
from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import build_model
from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import load_checkpoint
from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import list_pairs
from restrictive_hierarchical_semantic_segmentation_tpu.train.state import create_train_state
from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
    make_eval_step, split_targets, _device_decode)
from restrictive_hierarchical_semantic_segmentation_tpu.metrics.segmentation import level_confusion_matrices

print("backend:", jax.default_backend())
tree = ClassTree.from_json('/root/repo/assets/class_tree_tl_extended.json',
                           '/root/repo/assets/class_map_extended.csv')
model = build_model(tree, model_select=1, model_type=1, dtype=jnp.bfloat16)
sample = np.zeros((1, 620, 620, 3), np.float32)
state, _ = create_train_state(model, jax.random.PRNGKey(0), sample, 0.0)
state, meta = load_checkpoint('/root/repo/.recipe/recipe_runs/hier_hrnet_ext_repro/fold_1/best.ckpt', state)

EXT_LW = ast.literal_eval("[[0.0297, 0.7230],[1.2695, 0.1770],[1.577, 0.9619, 3.9722, 0.9494],[1.5432, 0.2638, 1.0413]]")
eval_step = make_eval_step(model, tree, True, EXT_LW)

imgs, labs = list_pairs('/root/repo/.recipe/tlpano_synth/fold_1/val')
ds = SegDataset(imgs, labs, tree, 620, hierarchical=True, augment=False,
                target_dtype=np.int8, emit_gray=True)
ld = BatchLoader(ds, 4, shuffle=False, drop_last=True, num_workers=1, seed=0)
batches = []
for bi, (x, y) in enumerate(ld):
    batches.append((np.asarray(x), np.asarray(y)))
    if bi >= 0:
        break
ld.close()
x, y = batches[0]
res = jax.device_get(eval_step(state.params, state.batch_stats,
                               jnp.asarray(x), jnp.asarray(y)))
print("REAL eval_step L0 cm:\n", np.asarray(res["confmats"][0]))

# probe-1 exact program (margin nan-stats epilogue)
@jax.jit
def p1(params, bstats, images, targets):
    images, targets = _device_decode(images, targets)
    out = model.apply({"params": params, "batch_stats": bstats}, images, train=False)
    tgt = split_targets(tree, targets, True)
    cms = level_confusion_matrices(list(out.logits_per_level), tgt)
    z0 = out.logits_per_level[0].astype(jnp.float32)
    marg = z0[..., 1] - z0[..., 0]
    t0 = tgt[0]
    mp = jnp.where(t0[..., 1] == 1, marg, jnp.nan)
    return cms, jnp.nanmean(mp), jnp.nanmin(mp), jnp.nanmax(mp)

cms, mm, mn, mx = jax.device_get(p1(state.params, state.batch_stats,
                                    jnp.asarray(x), jnp.asarray(y)))
print("probe1-program L0 cm:\n", np.asarray(cms[0]))
print(f"probe1 margins mean={float(mm):+.3f} min={float(mn):+.3f} max={float(mx):+.3f}")
