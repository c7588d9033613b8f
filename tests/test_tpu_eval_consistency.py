"""TPU-only regression: eval-step metric one-hots must agree with the scores
the same program returns (VERDICT r4 weak #2 root cause).

Round 4's fused first-max one-hot (``metrics/segmentation.py``) contained a
value SELF-comparison ``x == max(x)``. On TPU, XLA may duplicate the bf16
producer of ``x`` (head conv -> bf16 resize matmul -> f32 cast) into the two
consuming fusions at different effective precisions, making the equality fail
on ~all pixels; all-false rows are scored as synthesized background. This
collapsed the depth-4 extended-tree level-0 eval metrics (recall 0.018
reported vs 0.984 actual — the r4 recipe tables and every in-run val metric
of the ext arms) while the forward itself was healthy. Fixed by pinning one
materialized copy with ``lax.optimization_barrier``.

This test runs the REAL ``make_eval_step`` (bf16 hier model, extended depth-4
tree) on the live TPU backend and asserts the in-program confusion matrices
match a host-side confusion recomputed from the scores the very same program
returned (``return_outputs=True``). Pre-fix this fails with ~98% of pixels
migrating to the background column; post-fix the only tolerated slack is
tie-break jitter on bf16 rounding boundaries (<0.5% of pixels).

Skipped on CPU — intentionally: the hazard needs the TPU bf16 fusion
behavior (the CPU backend computes both copies identically, which is exactly
how the bug evaded the 238-test suite for a round).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="the bf16 duplicate-producer fusion hazard needs a TPU backend",
)


def test_eval_step_confusion_matches_returned_scores(extended_tree):
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (  # noqa: E501
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_eval_step,
        split_targets,
    )

    tree = extended_tree
    assert tree.num_levels == 4  # the depth the r4 collapse shipped at
    # UNet keeps the compile small; the hazard lives in the metric one-hot
    # over bf16 logits + resize, which UNet's head exercises identically
    model = build_model(tree, model_select=0, model_type=1,
                        dtype=jnp.bfloat16)
    size = 96
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    # random one-hot-per-level targets (no -1: masking is orthogonal here)
    tgts = []
    for c in tree.classes_per_level:
        idx = rng.integers(0, c, (2, size, size))
        tgts.append(np.eye(c, dtype=np.float32)[idx])
    y = np.concatenate(tgts, axis=-1)

    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  np.zeros((1, size, size, 3), np.float32),
                                  0.0)
    step = make_eval_step(model, tree, True, return_outputs=True)
    res = jax.device_get(
        step(state.params, state.batch_stats, jnp.asarray(x), jnp.asarray(y))
    )

    tgt_split = [np.asarray(t) for t in split_targets(tree, jnp.asarray(y), True)]
    n_px = 2 * size * size
    for L, (score, t) in enumerate(zip(res["outputs"], tgt_split)):
        cm = np.asarray(res["confmats"][L], np.int64)
        # host reference from the SAME returned scores
        p = np.asarray(score, np.float32).argmax(-1)
        ti = t.argmax(-1)
        if L > 0:  # child levels: synthesized background prepended, bg ignored
            c = score.shape[-1] + 1
            p, ti = p + 1, ti + 1
            valid = t.max(-1) > 0
        else:
            c = score.shape[-1]
            valid = np.ones_like(p, bool)
        ref = np.zeros((c, c), np.int64)
        np.add.at(ref, (ti[valid].ravel(), p[valid].ravel()), 1)
        # rows must match up to bf16 tie-break jitter (<0.5% of pixels);
        # the pre-fix failure mode moves ~98% of column mass to background
        assert np.abs(cm - ref).sum() / 2 <= 0.005 * n_px, (
            f"level {L}: in-program confusion disagrees with the program's "
            f"own returned scores\ncm=\n{cm}\nref=\n{ref}"
        )
