"""VERDICT r1 item #9: decide the "Pallas fused conv+BN" question with data.

Candidate: the HRNet shared-head 1x1 conv (720->720 at 1/4 resolution — the
largest single matmul-shaped op in the model) followed by BN(+fold) and ReLU,
in eval/serving mode where BN is a per-channel scale/bias.

Compares, on the real chip with value-fetch synchronization:
  A) XLA: conv1x1 -> scale/bias -> relu (XLA fuses the epilogue itself)
  B) Pallas: one kernel — tiled matmul with f32 accumulation, per-channel
     a/b epilogue, relu, bf16 out.

Prints one JSON line with both times. Run: python tools/pallas_conv_bn_experiment.py
"""
import functools
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W, C = 4, 155, 155, 720
    N = B * H * W  # 96100 pixels
    TILE_N = 512
    N_PAD = ((N + TILE_N - 1) // TILE_N) * TILE_N

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_PAD, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.bfloat16)
    a = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    # ---- A: XLA --------------------------------------------------------
    @jax.jit
    def xla_fused(x, w, a, b):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return jnp.maximum(y * a + b, 0.0).astype(jnp.bfloat16)

    # ---- B: Pallas -----------------------------------------------------
    def kernel(x_ref, w_ref, a_ref, b_ref, o_ref):
        acc = jnp.dot(x_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * a_ref[:] + b_ref[:], 0.0)
        o_ref[:] = y.astype(jnp.bfloat16)

    @jax.jit
    def pallas_fused(x, w, a, b):
        grid = (N_PAD // TILE_N,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_PAD, C), jnp.bfloat16),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
                pl.BlockSpec((C, C), lambda i: (0, 0)),
                pl.BlockSpec((C,), lambda i: (0,)),
                pl.BlockSpec((C,), lambda i: (0,)),
            ],
            out_specs=pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
        )(x, w, a, b)

    def timeit(fn, *args, steps=50):
        y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))  # warm + sync
        t0 = time.time()
        for _ in range(steps):
            y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))
        return (time.time() - t0) / steps

    ya = xla_fused(x, w, a, b)
    yb = pallas_fused(x, w, a, b)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    ta = timeit(xla_fused, x, w, a, b)
    tb = timeit(pallas_fused, x, w, a, b)
    bytes_moved = (N_PAD * C * 2 * 2 + C * C * 2)  # x in + y out + w
    flops = 2 * N_PAD * C * C
    print(json.dumps({
        "shape": f"({N_PAD},{C})x({C},{C})",
        "max_abs_err": err,
        "xla_ms": round(ta * 1e3, 3),
        "pallas_ms": round(tb * 1e3, 3),
        "xla_TFs": round(flops / ta / 1e12, 1),
        "pallas_TFs": round(flops / tb / 1e12, 1),
        "roofline_ms_hbm": round(bytes_moved / 819e9 * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
