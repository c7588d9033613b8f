"""Serving-path benchmark: bf16 vs int8-quantized eval forward of the
flagship hierarchical HRNet-W48 at 620px on the real chip.

Weights are baked as constants (the Predictor deployment mode): BN running
stats fold into the epilogue, and in the quantized variant the per-channel
int8 weights are trace-time constants (half the weight HBM traffic). Prints
one JSON line with latency/throughput for both paths, the speedup, and the
numerical deltas (mean |prob| difference + class-map agreement) so the
accuracy cost of int8 is a measured number, not a guess.

Run: python tools/serving_bench.py [--batch 4] [--img 620] [--steps 30]
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--model", default="hrnet", choices=["hrnet", "unet"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.quantize import (
        default_skip,
        calibrate,
        quantized_apply,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )
    model = build_model(
        tree, model_select=1 if args.model == "hrnet" else 0, model_type=1,
        dtype=jnp.bfloat16,
    )
    B, S = args.batch, args.img
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (B, S, S, 3)).astype(np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x[:1], 0.0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    scales = calibrate(model.apply, variables, [x], train=False)
    q_apply = quantized_apply(model.apply, scales)

    @jax.jit
    def f_bf16(xx):
        out = model.apply(variables, xx, train=False)
        return out.probs_per_level

    @jax.jit
    def f_int8(xx):
        out = q_apply(variables, xx, train=False)
        return out.probs_per_level

    xd = jax.device_put(x)

    def timeit(fn, steps):
        ps = fn(xd)
        float(jnp.sum(ps[-1].astype(jnp.float32)))  # warm + value-fetch sync
        t0 = time.time()
        for _ in range(steps):
            ps = fn(xd)
        float(jnp.sum(ps[-1].astype(jnp.float32)))
        return (time.time() - t0) / steps

    tb = timeit(f_bf16, args.steps)
    tq = timeit(f_int8, args.steps)

    pb = [np.asarray(p, np.float32) for p in f_bf16(xd)]
    pq = [np.asarray(p, np.float32) for p in f_int8(xd)]
    prob_delta = float(np.mean([np.abs(a - b).mean() for a, b in zip(pb, pq)]))
    agree = float(np.mean([
        (a.argmax(-1) == b.argmax(-1)).mean() for a, b in zip(pb, pq)
    ]))

    print(json.dumps({
        "config": f"hier_{args.model}_{S}px_b{B}_eval",
        "bf16_ms": round(tb * 1e3, 2),
        "int8_ms": round(tq * 1e3, 2),
        "bf16_img_s": round(B / tb, 2),
        "int8_img_s": round(B / tq, 2),
        "speedup": round(tb / tq, 3),
        "mean_abs_prob_delta": round(prob_delta, 5),
        "argmax_agreement": round(agree, 5),
        "n_quantized_convs": sum(1 for k in scales if not default_skip(k)),
    }))


if __name__ == "__main__":
    main()
