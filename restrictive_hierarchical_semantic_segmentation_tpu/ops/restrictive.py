"""Restrictive-head math: gated grouped softmax + probabilistic composition.

Reference semantics (models.py:273-306 for UNet, models.py:771-798 for HRNet):
for every level ``L >= 1``, child logits are grouped by parent; within each
group ``g`` of parent ``p``::

    Q_g = softmax(z_g + log(P_p + eps))          # gated conditional
    P_c = P_p * Q_g                              # probabilistic composition

The reference loops over parent groups in Python with dynamic slices. Here the
whole level is one vectorized pass over static index tables from ``ClassTree``:

* ``parent_index``  (C_child,) -> parent channel at the previous level
* ``child_to_parent`` (C_child, C_parent) one-hot assignment matrix ``A``

The grouped softmax becomes: gather parent stats per child channel, a masked
per-group max (stability), ``exp``, and a masked per-group sum — all
static-shaped, fully fusible elementwise/VPU work (deliberately *not* an MXU
matmul: TPU default matmul precision is bf16, which would cost ~5e-4 relative
error on the probabilities), instead of D Python-loop dispatches.

Because every child channel belongs to exactly one group, grouped softmax over
channel axis == exp(z - max_g) / segsum_g, where per-child group stats are
``(stat_per_parent)[parent_index]`` — a gather on the last (lane) axis of an
NHWC tensor, which XLA lowers to a cheap one-hot matmul on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gated_grouped_softmax", "compose_children", "grouped_conditional_kl",
           "static_channel_take"]

_EPS = 1e-6  # reference eps, models.py:274/:761


def static_channel_take(x: jax.Array, idx) -> jax.Array:
    """``x[..., idx]`` for a STATIC integer index list — as slices + concat.

    ``jnp.take``/fancy indexing lower to an XLA gather, which the TPU backend
    turns into a serial while + dynamic-update-slice loop over the indices at
    full activation resolution (~25 ms/step measured across the 620px train
    step, results/profile_r4) with a scatter-add transpose. Static slices
    fuse, and their transpose is slice-wise adds. Bit-exact replacement.
    """
    idx = [int(i) for i in np.asarray(idx).ravel()]
    runs: list = []  # consecutive ascending runs -> one slice each
    for i in idx:
        if runs and runs[-1][1] == i:
            runs[-1][1] = i + 1
        else:
            runs.append([i, i + 1])
    parts = [jax.lax.slice_in_dim(x, a, b, axis=-1) for a, b in runs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)

# Above this many parent groups the per-group unrolled reductions (trace time
# and program size linear in the parent count) switch to the vectorized
# segment formulation: segment_max over a channel-leading layout plus a
# one-hot-matrix contraction for the group sums (an MXU matmul at HIGHEST
# precision — a contraction, so no (..., C_child, C_parent) broadcast ever
# materializes). Unrolling stays the default for the paper-scale trees
# (fanout <= 4) where it fuses best.
GROUP_UNROLL_LIMIT = 8


def gated_grouped_softmax(
    z_children: jax.Array,
    p_parent: jax.Array,
    parent_index: np.ndarray,
    child_to_parent: np.ndarray,
) -> tuple[jax.Array, jax.Array]:
    """Per-parent-group softmax of ``z + log(P_parent + eps)``.

    Args:
      z_children: (..., C_child) child logits (level head output).
      p_parent:   (..., C_parent) previous-level probabilities.
      parent_index: static (C_child,) int array, child -> parent channel.
      child_to_parent: static (C_child, C_parent) one-hot float matrix.

    Returns:
      (Q, P_child): the conditional ``Q_{c|p}`` and composed ``P_c = P_p * Q``.
    """
    pidx_np = np.asarray(parent_index)
    pidx = jnp.asarray(pidx_np)
    n_child = int(pidx_np.shape[0])
    # static member lists per parent group (tree structure is static)
    groups = {}
    for c in range(n_child):
        groups.setdefault(int(pidx_np[c]), []).append(c)

    wide = len(groups) > GROUP_UNROLL_LIMIT
    if wide:
        # one-hot contraction keeps the jaxpr size tree-independent on wide
        # trees; parent->child broadcast of per-parent stats is the SAME
        # matrix A transposed, still an MXU matmul (exact: each row of A has
        # one 1, the contraction adds zeros), never an XLA gather
        a = jnp.asarray(np.asarray(child_to_parent), jnp.float32)

        def broadcast_parents(stat):  # (..., C_parent) -> (..., C_child)
            return jnp.einsum("...p,cp->...c", stat, a,
                              precision=jax.lax.Precision.HIGHEST)

        p_gathered = broadcast_parents(p_parent)
    else:
        p_gathered = static_channel_take(p_parent, pidx_np)  # (..., C_child)
    gated = z_children + jnp.log(p_gathered + _EPS)

    if wide:
        # vectorized segment path for wide trees (see GROUP_UNROLL_LIMIT)
        n_parent = int(np.asarray(child_to_parent).shape[1])
        g2 = jnp.moveaxis(gated, -1, 0)  # (C_child, ...)
        gmax = jax.ops.segment_max(g2, pidx, num_segments=n_parent,
                                   indices_are_sorted=False)
        group_max = jnp.moveaxis(gmax, 0, -1)  # (..., C_parent)
        # childless parents' segment_max is -inf; no child reads them, but
        # the one-hot contraction would turn 0 * -inf into NaN — zero them
        group_max = jnp.where(jnp.isfinite(group_max), group_max, 0.0)
        gated = gated - broadcast_parents(group_max)
        e = jnp.exp(gated)
        sums = jnp.einsum("...c,cp->...p", e, a,
                          precision=jax.lax.Precision.HIGHEST)
        q = e / broadcast_parents(sums)
        return q, p_gathered * q

    # Per-group softmax via STATIC per-child sibling reductions. The groups
    # are tiny and known at trace time, so this unrolls into slices/maxima of
    # (..., |group|) tensors — crucially NEVER materializing a
    # (..., C_child, C_parent) broadcast, which at 620x620 activations would
    # be the dominant HBM traffic of the whole model.
    group_max_c = [None] * n_child
    for members in groups.values():
        m = jnp.max(static_channel_take(gated, members), axis=-1)
        for c in members:
            group_max_c[c] = m
    gated = gated - jnp.stack(group_max_c, axis=-1)

    e = jnp.exp(gated)
    group_sum_c = [None] * n_child
    for members in groups.values():
        s = jnp.sum(static_channel_take(e, members), axis=-1)
        for c in members:
            group_sum_c[c] = s
    q = e / jnp.stack(group_sum_c, axis=-1)
    return q, p_gathered * q


def compose_children(
    z_children: jax.Array,
    p_parent: jax.Array,
    parent_index: np.ndarray,
    child_to_parent: np.ndarray,
) -> jax.Array:
    """Convenience: only the composed child probabilities ``P_c``."""
    _, p_child = gated_grouped_softmax(
        z_children, p_parent, parent_index, child_to_parent
    )
    return p_child


def grouped_conditional_kl(
    q_children: jax.Array,
    child_to_parent: np.ndarray,
) -> jax.Array:
    """Optional stabiliser: mean over groups of KL(Q_{c|p} || Uniform_g).

    Implements the intent of the reference's commented-out
    ``grouped_conditional_kl`` (losses.py:180-210): per parent group,
    ``mean(Q * (log Q - log(1/g)))``. The reference's trainer passes
    ``lambda_kl=0.1`` but the implementation is commented out, so the default
    framework config keeps this at weight 0 for behavioral parity.
    """
    A = jnp.asarray(child_to_parent, dtype=q_children.dtype)
    group_size = A.sum(axis=0)  # (C_parent,)
    pidx = jnp.argmax(A, axis=-1)
    g = jnp.take(group_size, pidx)  # (C_child,)
    q = jnp.clip(q_children, 1e-8, None)
    kl_terms = q * (jnp.log(q) + jnp.log(g))
    # reference: per-group .mean() over all elements, then mean over groups.
    # Each group's mean is over (batch*H*W*g) terms; groups all see the same
    # spatial extent, so mean-of-group-means == weighted channel mean:
    n_groups = int((np.asarray(child_to_parent).sum(axis=0) > 0).sum())
    per_channel = jnp.mean(kl_terms, axis=tuple(range(kl_terms.ndim - 1)))
    return jnp.sum(per_channel / g) / n_groups
