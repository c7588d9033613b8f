"""LeanBatchNorm == flax nn.BatchNorm semantics (models/norm.py).

The lean module folds normalization into a per-channel ``y = x*a + b`` so the
big-tensor math stays in the compute dtype (the round-1 HBM diagnosis); these
tests pin that the fold changes nothing semantically: same variable layout,
same outputs, same running-stat updates, in train and eval mode.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from restrictive_hierarchical_semantic_segmentation_tpu.models.norm import (
    BN_MOMENTUM,
    LeanBatchNorm,
)


def _flax_bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=1e-5)


def _random_vars(rng, c):
    return {
        "params": {
            "scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=c), jnp.float32),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.normal(size=c), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.2, 2.0, c), jnp.float32),
        },
    }


def test_variable_layout_matches_flax():
    x = jnp.ones((2, 4, 4, 3))
    v_lean = LeanBatchNorm(use_running_average=False).init(
        jax.random.PRNGKey(0), x
    )
    v_flax = _flax_bn(True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_lean) == jax.tree_util.tree_structure(
        v_flax
    )


def test_eval_mode_matches_flax():
    rng = np.random.default_rng(0)
    c = 5
    x = jnp.asarray(rng.normal(size=(2, 6, 6, c)), jnp.float32)
    variables = _random_vars(rng, c)
    y_lean = LeanBatchNorm(use_running_average=True).apply(variables, x)
    y_flax = _flax_bn(False).apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_lean), np.asarray(y_flax), rtol=1e-5, atol=1e-6
    )


def test_train_mode_matches_flax_incl_stats():
    rng = np.random.default_rng(1)
    c = 4
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(3, 8, 8, c)), jnp.float32)
    variables = _random_vars(rng, c)
    y_lean, upd_lean = LeanBatchNorm(use_running_average=False).apply(
        variables, x, mutable=["batch_stats"]
    )
    y_flax, upd_flax = _flax_bn(True).apply(
        variables, x, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(y_lean), np.asarray(y_flax), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(upd_lean["batch_stats"]["mean"]),
        np.asarray(upd_flax["batch_stats"]["mean"]),
        rtol=1e-6, atol=1e-7,
    )
    # running var: lean stores torch's UNBIASED batch variance (n/(n-1));
    # flax stores the biased one — reconstruct flax's expected update
    n = x.shape[0] * x.shape[1] * x.shape[2]
    ra, m = np.asarray(variables["batch_stats"]["var"]), BN_MOMENTUM
    flax_var = np.asarray(upd_flax["batch_stats"]["var"])
    batch_var_biased = (flax_var - m * ra) / (1 - m)
    want = m * ra + (1 - m) * batch_var_biased * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(upd_lean["batch_stats"]["var"]), want, rtol=1e-6, atol=1e-7
    )


def test_bf16_big_ops_stay_bf16_and_match_f32():
    """In bf16 the output dtype is bf16 and tracks the f32 result within
    bf16 rounding; the jaxpr's large elementwise ops carry no f32 tensors of
    the activation shape (the fold's whole point)."""
    rng = np.random.default_rng(2)
    c = 8
    x32 = jnp.asarray(rng.normal(size=(2, 16, 16, c)), jnp.float32)
    variables = _random_vars(rng, c)
    bn16 = LeanBatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    y16, _ = bn16.apply(variables, x32.astype(jnp.bfloat16),
                        mutable=["batch_stats"])
    assert y16.dtype == jnp.bfloat16
    y32, _ = LeanBatchNorm(use_running_average=False).apply(
        variables, x32, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), rtol=0.05, atol=0.05
    )

    # structural assertion: every f32 tensor of the full activation shape is
    # consumed ONLY by reductions (XLA fuses convert/square into the reduce —
    # nothing f32-sized lands in HBM); the normalize path itself is pure bf16
    jaxpr = jax.make_jaxpr(
        lambda v, xx: bn16.apply(v, xx, mutable=["batch_stats"])
    )(variables, x32.astype(jnp.bfloat16)).jaxpr
    consumers = {}
    for eqn in jaxpr.eqns:
        for v in eqn.invars:
            if not isinstance(v, jax.extend.core.Literal):
                consumers.setdefault(v, []).append(eqn.primitive.name)
    stats_only = {"reduce_sum", "reduce_max", "square", "integer_pow", "mul",
                  "convert_element_type"}
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            if (getattr(v.aval, "shape", ()) == (2, 16, 16, c)
                    and v.aval.dtype == jnp.float32):
                used_by = set(consumers.get(v, []))
                assert used_by <= stats_only, (
                    f"f32 activation-sized tensor from {eqn.primitive.name} "
                    f"consumed by {used_by}"
                )


def test_grad_flows_and_matches_flax():
    rng = np.random.default_rng(3)
    c = 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)), jnp.float32)
    variables = _random_vars(rng, c)

    def loss_lean(v, xx):
        y, _ = LeanBatchNorm(use_running_average=False).apply(
            v, xx, mutable=["batch_stats"]
        )
        return jnp.sum(jnp.square(y))

    def loss_flax(v, xx):
        y, _ = _flax_bn(True).apply(v, xx, mutable=["batch_stats"])
        return jnp.sum(jnp.square(y))

    g_lean = jax.grad(loss_lean, argnums=(0, 1))(variables, x)
    g_flax = jax.grad(loss_flax, argnums=(0, 1))(variables, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g_lean, g_flax,
    )
