"""Post-training int8 quantization for serving (TPU MXU int8 path).

The reference has no quantized inference (it has no serving story at all —
predictEval.py re-runs the eager model at batch 1). On v5e the MXU's int8
throughput is 2x bf16, and ``tools/int8_experiment.py`` measured real wins on
this model's dominant op shapes (1.3x on the 720-ch head matmul, 1.16x on a
stage-4 3x3 conv), so the serving path gets a measured-not-assumed int8 mode.

Design: **flax method interceptors**, zero changes to the model code.

* ``calibrate``: one forward pass per calibration batch with an interceptor
  that ``sow``s each ``nn.Conv``'s input absolute-max into a ``quant_stats``
  collection (reduce = running max across batches). Everything stays inside
  ``Module.apply`` — jit-compatible, no eager per-op dispatch.
* ``quant_interceptor``: replaces every intercepted ``nn.Conv.__call__`` with
  symmetric int8 quantization — per-tensor activation scale (from
  calibration), per-output-channel weight scales (computed from the kernel,
  exact at trace time) — an int8xint8->int32 ``conv_general_dilated`` on the
  MXU, and a float dequant+bias epilogue. Convs the scheme doesn't cover
  (grouped/dilated) and convs matching ``skip`` (by default the per-level
  heads, whose logits feed the gated-softmax composition and deserve full
  precision) fall through to the original float path.

Weights are quantized at trace time; under the serving Predictor they are
baked as int8 constants, so quantized serving also halves weight HBM traffic.
"""
from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["calibrate", "make_quant_interceptor", "quantized_apply"]

_EPS = 1e-12


def _path_str(module: nn.Module) -> str:
    return "/".join(module.path)


def _is_plain_conv(m: nn.Module) -> bool:
    if not isinstance(m, nn.Conv):
        return False
    groups = getattr(m, "feature_group_count", 1)
    dil = getattr(m, "kernel_dilation", 1)
    dil_ok = dil in (1, None) or tuple(np.atleast_1d(dil)) == (1, 1)
    return groups == 1 and dil_ok


def _conv_geometry(m: nn.Conv):
    """Normalize flax Conv attrs to lax.conv_general_dilated arguments."""
    strides = m.strides or 1
    if isinstance(strides, int):
        strides = (strides, strides)
    padding = m.padding
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, Sequence) and not isinstance(padding, str):
        padding = tuple(
            (p, p) if isinstance(p, int) else tuple(p) for p in padding
        )
    return tuple(strides), padding


def _calib_interceptor(next_fun, args, kwargs, context):
    m = context.module
    if _is_plain_conv(m) and context.method_name == "__call__":
        amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
        m.sow(
            "quant_stats", "in_amax", amax,
            init_fn=lambda: jnp.zeros((), jnp.float32),
            reduce_fn=jnp.maximum,
        )
    return next_fun(*args, **kwargs)


def calibrate(
    apply_fn: Callable,
    variables: Dict,
    batches: Iterable,
    **apply_kwargs,
) -> Dict[str, float]:
    """Run ``apply_fn`` (e.g. ``model.apply``) over calibration batches and
    return ``{conv_path: input_absmax}``.

    ``apply_fn(variables, batch, ...)`` is jitted per unique shape; the stats
    ride the ``quant_stats`` collection (device-side max-reduce per batch,
    host-side max across batches).
    """
    scales: Dict[str, float] = {}

    @jax.jit
    def one(batch):
        with nn.intercept_methods(_calib_interceptor):
            _, upd = apply_fn(
                variables, batch, mutable=["quant_stats"], **apply_kwargs
            )
        return upd["quant_stats"]

    def collect(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                collect(v, p)
            else:  # sow leaf: reduced scalar (custom reduce_fn) or a tuple
                vals = v if isinstance(v, (tuple, list)) else (v,)
                val = float(np.max([np.asarray(x) for x in vals]))
                key = p.rsplit("/", 1)[0]  # strip the 'in_amax' leaf name
                scales[key] = max(scales.get(key, 0.0), val)

    for batch in batches:
        collect(jax.device_get(one(batch)), "")
    return scales


_HEAD_RE = re.compile(r"(^|/)head_(l\d+|flat)($|/)")


def default_skip(path: str) -> bool:
    """True for the per-level logits heads (kept float by default).

    Matches only ``head_l<N>``/``head_flat`` path components — NOT
    ``shared_head_conv`` (hrnet.py), which int8_experiment.py measured as
    the largest int8 win and must stay quantized."""
    return _HEAD_RE.search(path) is not None


def make_quant_interceptor(
    act_scales: Dict[str, float],
    skip: Optional[Callable[[str], bool]] = None,
):
    """Interceptor running every covered ``nn.Conv`` in int8.

    ``skip(path) -> True`` keeps that conv in float (default: the
    per-level logits heads only — ``head_l<N>``/``head_flat`` — NOT the
    720-ch ``shared_head_conv``, which is the largest measured int8 win)."""
    if skip is None:
        skip = default_skip

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (
            not _is_plain_conv(m)
            or context.method_name != "__call__"
            or not m.has_variable("params", "kernel")
        ):
            return next_fun(*args, **kwargs)
        path = _path_str(m)
        amax = act_scales.get(path)
        if amax is None or amax <= 0.0 or skip(path):
            return next_fun(*args, **kwargs)

        x = args[0]
        kernel = m.get_variable("params", "kernel").astype(jnp.float32)
        strides, padding = _conv_geometry(m)

        sx = jnp.float32(amax / 127.0)
        # per-output-channel symmetric weight scale — exact at trace time
        sw = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, _EPS
        )
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
        kq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)

        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        acc = jax.lax.conv_general_dilated(
            xq, kq, strides, padding, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (sx * sw)
        if m.use_bias:
            y = y + m.get_variable("params", "bias").astype(jnp.float32)
        out_dtype = m.dtype or x.dtype
        return y.astype(out_dtype)

    return interceptor


def quantized_apply(
    apply_fn: Callable,
    act_scales: Dict[str, float],
    skip: Optional[Callable[[str], bool]] = None,
):
    """Wrap ``apply_fn`` so all covered convs run int8. Returns a callable
    with the same signature (jit it as usual)."""
    interceptor = make_quant_interceptor(act_scales, skip)

    def wrapped(variables, *args, **kwargs):
        with nn.intercept_methods(interceptor):
            return apply_fn(variables, *args, **kwargs)

    return wrapped
