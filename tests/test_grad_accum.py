"""Gradient accumulation (train/steps.py accum_step): one optimizer step from
N sequential microbatches — microbatch-mean gradients, sequential BatchNorm
statistics, summed confusion matrices, one-microbatch peak memory."""
import numpy as np
import optax
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.models import (
    hierarchical as H,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (  # noqa: E501
    UNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
    TrainState,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
    make_train_step,
)


@pytest.fixture(scope="module")
def setup(default_tree):
    import jax

    model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    y = np.ones((4, 32, 32, default_tree.num_classes), np.float32)
    y[:, :16] = 0.0
    y[:, :, :8, 4:] = -1.0  # exercise the ternary mask path
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    return model, default_tree, x, y, variables


def _state(variables, tx):
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


class TestGradAccum:
    def test_equals_sequential_microbatch_grads(self, setup):
        """accum_step == mean of per-microbatch grads taken with SEQUENTIAL
        batch stats — verified exactly via an lr=1 SGD optimizer (param
        delta IS the gradient)."""
        import jax
        import jax.numpy as jnp

        model, tree, x, y, variables = setup
        tx = optax.sgd(1.0)
        mask = jnp.ones((tree.num_levels,), jnp.float32)

        step1 = make_train_step(model, tx, tree, True, donate=False)
        s0 = _state(variables, tx)
        sa, aux_a = step1(s0, x[:2], y[:2], mask)            # micro 1
        sb, aux_b = step1(
            s0.replace(batch_stats=sa.batch_stats), x[2:], y[2:], mask
        )                                                     # micro 2
        g1 = jax.tree_util.tree_map(lambda p0, p1: p0 - p1,
                                    s0.params, sa.params)
        g2 = jax.tree_util.tree_map(lambda p0, p1: p0 - p1,
                                    s0.params, sb.params)

        step_acc = make_train_step(model, tx, tree, True, donate=False,
                                   grad_accum=2)
        s_acc, aux = step_acc(_state(variables, tx), x, y, mask)

        # params moved by the microbatch-mean gradient
        for pa, p0, a, b in zip(
            jax.tree_util.tree_leaves(s_acc.params),
            jax.tree_util.tree_leaves(s0.params),
            jax.tree_util.tree_leaves(g1),
            jax.tree_util.tree_leaves(g2),
        ):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(p0) - 0.5 * (np.asarray(a)
                                                        + np.asarray(b)),
                rtol=1e-5, atol=1e-6,
            )
        # final BN stats follow the sequential microbatch trajectory
        for sp, ss in zip(
            jax.tree_util.tree_leaves(s_acc.batch_stats),
            jax.tree_util.tree_leaves(sb.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(sp), np.asarray(ss),
                                       rtol=1e-5, atol=1e-7)
        # loss/per_level are microbatch means; confmats sum
        np.testing.assert_allclose(
            float(aux["loss"]),
            0.5 * (float(aux_a["loss"]) + float(aux_b["loss"])), rtol=1e-6)
        for ca, c1, c2 in zip(aux["confmats"], aux_a["confmats"],
                              aux_b["confmats"]):
            np.testing.assert_array_equal(
                np.asarray(ca), np.asarray(c1) + np.asarray(c2))

    def test_close_to_full_batch(self, setup):
        """Not identical to one big batch (BN statistics + masked-loss
        denominators differ per microbatch) but close."""
        import jax.numpy as jnp

        model, tree, x, y, variables = setup
        tx = optax.adamw(1e-3)
        mask = jnp.ones((tree.num_levels,), jnp.float32)
        _, aux_full = make_train_step(model, tx, tree, True, donate=False)(
            _state(variables, tx), x, y, mask)
        _, aux_acc = make_train_step(model, tx, tree, True, donate=False,
                                     grad_accum=2)(
            _state(variables, tx), x, y, mask)
        np.testing.assert_allclose(float(aux_acc["loss"]),
                                   float(aux_full["loss"]), rtol=0.05)

    def test_rejects_indivisible_batch(self, setup):
        import jax.numpy as jnp

        model, tree, x, y, variables = setup
        tx = optax.sgd(1.0)
        step = make_train_step(model, tx, tree, True, donate=False,
                               grad_accum=3)
        with pytest.raises(ValueError, match="divisible"):
            step(_state(variables, tx), x, y,
                 jnp.ones((tree.num_levels,), jnp.float32))
