"""Batch-1 serving latency levers for the hier-HRNet-W48 620px forward
(VERDICT r2 "What's missing" #5 / "Next round" #6).

Round 2 measured the bare on-device forward at 7.93 ms bf16 and int8 NOT
paying at batch 1 (0.96x — quant overhead dominates small ops). This tool
measures the END-TO-END host-to-host latency (numpy in -> result on host,
the number a serving user actually sees) and each designed lever:

  probs      : baseline — fetch full per-level probability maps
               (620^2 x 8ch float32 ~ 12.3 MB over the relay)
  classmaps  : argmax on device, fetch int32 class maps only (Predictor
               outputs=("class_maps",) — 3.1 MB)
  classmaps_u8  : + class maps cast to uint8 on device (0.77 MB fetch)
  classmaps_u8_bf16in : + bf16 input upload (1.15 MB H2D instead of 2.3)
  classmaps_u8_u8in   : + uint8 input upload with on-device [0,1]->norm
               decode (0.38 MB H2D; the --host-compact training path's
               convention)
  ondevice   : forward only, input pre-staged, one-scalar sync — the
               compute floor (round-2's 7.93 ms comparable)

Run on the chip: python tools/serving_latency_b1.py [--steps 50]
Each row: one JSON line; paste into BENCHMARKS.md serving section.
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
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--img", type=int, default=620)
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
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )
    model = build_model(tree, model_select=1, model_type=1,
                        dtype=jnp.bfloat16)
    S = args.img
    rng = np.random.default_rng(0)
    x32 = rng.uniform(-1.0, 1.0, (1, S, S, 3)).astype(np.float32)
    xbf = x32.astype(jnp.bfloat16)
    xu8 = ((x32 * 0.5 + 0.5) * 255).astype(np.uint8)[..., :1]  # gray u8
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x32, 0.0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fwd(xx):
        return model.apply(variables, xx, train=False).probs_per_level

    @jax.jit
    def f_probs(xx):
        return tuple(p.astype(jnp.float32) for p in fwd(xx))

    @jax.jit
    def f_cmaps(xx):
        return tuple(jnp.argmax(p, -1).astype(jnp.int32) for p in fwd(xx))

    @jax.jit
    def f_cmaps_u8(xx):
        return tuple(jnp.argmax(p, -1).astype(jnp.uint8) for p in fwd(xx))

    @jax.jit
    def f_cmaps_u8_from_u8(xu):
        # uint8 gray -> [0,1] -> Normalize(.5,.5) -> 3ch, on device (the
        # host_compact training convention, steps.py _device_decode analog)
        xx = (xu.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        xx = jnp.broadcast_to(xx, xu.shape[:3] + (3,))
        return tuple(jnp.argmax(p, -1).astype(jnp.uint8) for p in fwd(xx))

    def fetch(res):
        return [np.asarray(r) for r in res]  # full host materialization

    def timeit_host2host(fn, host_in, steps):
        fetch(fn(host_in))  # warm/compile
        t0 = time.time()
        for _ in range(steps):
            out = fetch(fn(host_in))
        dt = (time.time() - t0) / steps
        return dt, out

    rows = []

    def add(name, fn, host_in, h2d_bytes):
        dt, out = timeit_host2host(fn, host_in, args.steps)
        d2h = sum(o.nbytes for o in out)
        rows.append({"lever": name, "ms": round(dt * 1e3, 2),
                     "img_s": round(1.0 / dt, 1),
                     "h2d_mb": round(h2d_bytes / 1e6, 2),
                     "d2h_mb": round(d2h / 1e6, 2)})

    add("probs", f_probs, x32, x32.nbytes)
    add("classmaps", f_cmaps, x32, x32.nbytes)
    add("classmaps_u8", f_cmaps_u8, x32, x32.nbytes)
    add("classmaps_u8_bf16in", f_cmaps_u8, np.asarray(xbf), xbf.nbytes)
    add("classmaps_u8_u8in", f_cmaps_u8_from_u8, xu8, xu8.nbytes)

    # compute floor: pre-staged input, one-scalar sync (round-2 comparable)
    xd = jax.device_put(x32)
    f_cmaps_u8(xd)
    float(jnp.sum(f_probs(xd)[-1]))
    t0 = time.time()
    for _ in range(args.steps):
        out = f_cmaps_u8(xd)
    s = int(np.asarray(out[-1]).sum())  # value fetch = the only real sync
    dt = (time.time() - t0) / args.steps
    rows.append({"lever": "ondevice_floor", "ms": round(dt * 1e3, 2),
                 "img_s": round(1.0 / dt, 1), "h2d_mb": 0.0,
                 "d2h_mb": round(sum(np.asarray(o).nbytes for o in out) / 1e6,
                                 2), "checksum": s})

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
