"""Decide the int8 serving question with data (round-1 notes item #5: "real
pallas wins would need whole fused conv+BN+act kernels or the int8 serving
path" — the conv+BN kernel was closed with a negative result in round 2;
this measures the other half).

On v5e the MXU's int8 peak is 2x the bf16 peak (394 vs 197 TOPS), so a
post-training-quantized serving path could in principle halve the compute
time of the conv-heavy eval forward, IF XLA lowers int8 convolutions/dots to
the MXU through this PJRT. That's the question this tool answers empirically,
on the two op shapes that dominate the HRNet forward:

  A) the shared-head 1x1 conv as a matmul: (96256,720)x(720,720)
  B) a stage-4 high-res-branch 3x3 conv: NHWC (4,155,155,48) -> 48ch

each in bf16 (baseline, f32 accum) vs int8 (int32 accum) with per-channel
dequant epilogue (the real serving computation: q(x)q(W) -> i32 -> scale).

Prints one JSON line. Run: python tools/int8_experiment.py
"""
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

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    def timeit(fn, *args, steps=50):
        y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))  # warm + sync (value fetch)
        t0 = time.time()
        for _ in range(steps):
            y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))
        return (time.time() - t0) / steps

    out = {}

    # ---- A: 1x1 conv as matmul ------------------------------------------
    N, C = 96256, 720
    x8 = jnp.asarray(rng.integers(-127, 128, (N, C)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (C, C)), jnp.int8)
    sx = jnp.float32(0.05)
    sw = jnp.asarray(rng.uniform(0.001, 0.01, (C,)), jnp.float32)
    xb = (x8.astype(jnp.float32) * sx).astype(jnp.bfloat16)
    wb = (w8.astype(jnp.float32) * sw).astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    @jax.jit
    def mm_int8(x, w, sx, sw):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (sx * sw)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    ta = timeit(mm_bf16, xb, wb)
    tb = timeit(mm_int8, x8, w8, sx, sw)
    flops = 2 * N * C * C
    err = float(jnp.max(jnp.abs(
        mm_bf16(xb, wb).astype(jnp.float32)
        - mm_int8(x8, w8, sx, sw).astype(jnp.float32))))
    out["matmul_720"] = {
        "bf16_ms": round(ta * 1e3, 3), "int8_ms": round(tb * 1e3, 3),
        "bf16_TOPs": round(flops / ta / 1e12, 1),
        "int8_TOPs": round(flops / tb / 1e12, 1),
        "speedup": round(ta / tb, 2), "max_abs_err": round(err, 4),
    }

    # ---- B: 3x3 conv NHWC ------------------------------------------------
    B, H, W, Ci, Co = 4, 155, 155, 48, 48
    xc8 = jnp.asarray(rng.integers(-127, 128, (B, H, W, Ci)), jnp.int8)
    kc8 = jnp.asarray(rng.integers(-127, 128, (3, 3, Ci, Co)), jnp.int8)
    skw = jnp.asarray(rng.uniform(0.001, 0.01, (Co,)), jnp.float32)
    xcb = (xc8.astype(jnp.float32) * sx).astype(jnp.bfloat16)
    kcb = (kc8.astype(jnp.float32) * skw).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(
        xc8.shape, kc8.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    @jax.jit
    def conv_int8(x, k, sx, sw):
        acc = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (sx * sw)
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    tc = timeit(conv_bf16, xcb, kcb)
    try:
        td = timeit(conv_int8, xc8, kc8, sx, skw)
        cerr = float(jnp.max(jnp.abs(
            conv_bf16(xcb, kcb).astype(jnp.float32)
            - conv_int8(xc8, kc8, sx, skw).astype(jnp.float32))))
        cflops = 2 * B * H * W * 9 * Ci * Co
        out["conv3x3_48"] = {
            "bf16_ms": round(tc * 1e3, 3), "int8_ms": round(td * 1e3, 3),
            "bf16_TOPs": round(cflops / tc / 1e12, 1),
            "int8_TOPs": round(cflops / td / 1e12, 1),
            "speedup": round(tc / td, 2), "max_abs_err": round(cerr, 4),
        }
    except Exception as e:  # int8 conv may not lower on this backend
        out["conv3x3_48"] = {
            "bf16_ms": round(tc * 1e3, 3),
            "int8_error": f"{type(e).__name__}: {str(e)[:200]}",
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
