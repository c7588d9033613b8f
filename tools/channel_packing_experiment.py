"""W48 -> W64 zero-padded channel-packing experiment (VERDICT r2 stretch #9).

tools/roofline.py showed HRNet-W48's 48/96-channel branches pad to the MXU's
128-lane tiles at ~0.375 efficiency, capping the chip at ~48% of peak. The
obvious lever: run the SAME network inside 64/128/256/512-wide buffers
(HRNet-W64 topology) with the extra channels zero — every conv then maps to
full 64-lane multiples. Zero-padding is exact at eval:

  * padded conv kernels are zero in both the new input slices (consume the
    zero channels) and the new output slices (produce zeros);
  * padded BN channels get gamma=1, beta=0, mean=0, var=1, so the padded
    activations stay exactly 0 through normalize+ReLU;
  * the per-level heads zero-pad only their input dim, so logits match
    bit-for-bit (up to fp reassociation).

Modes:
  --parity : CPU check — W48 outputs vs zero-padded W64 outputs on a tiny
             input (rtol 1e-4). Proves the padding recipe is quality-neutral.
  --bench  : TPU — train-step time of real W48 vs W64-topology (random
             init; step time depends on shapes, not values) at 620px.
             If W64's step is < 1.33x W48's (the FLOP ratio), the MXU
             padding win is real; record accept/reject in BENCHMARKS.md.

NOTE --bench compiles a fresh 620px W64 graph (10-25 min cold on the relay).
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402


def _models(dtype):
    import jax.numpy as jnp  # noqa: F401

    from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
        _width_cfg,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )

    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )

    def make(width):
        cfg = _width_cfg(width)
        return HierarchicalSegmenter(
            tree=tree, backbone=HRNetBackbone(config=cfg, dtype=dtype),
            hierarchical=True, final_conv_kernel=cfg.final_conv_kernel,
            align_corners=cfg.align_corners, dtype=dtype,
        ), cfg

    return tree, make


def _pad_tree(v48, v64):
    """Zero-pad every W48 leaf into its W64-shaped counterpart (same tree
    structure, larger channel dims). BN pads: scale/var -> 1, rest -> 0."""
    import jax

    def path_str(path):
        return "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)

    def scatter_concat(out, a48, axis, widths48, widths64):
        """Place each branch's channel block at its new concat offset."""
        o48 = o64 = 0
        for w48, w64 in zip(widths48, widths64):
            src = [slice(None)] * a48.ndim
            dst = [slice(None)] * a48.ndim
            src[axis] = slice(o48, o48 + w48)
            dst[axis] = slice(o64, o64 + w48)
            out[tuple(dst)] = a48[tuple(src)]
            o48 += w48
            o64 += w64
        return out

    def pad(a48, a64, path):
        a48, a64 = np.asarray(a48), np.asarray(a64)
        if a48.shape == a64.shape:
            return a48
        name = path_str(path)
        leaf = name.rsplit("/", 1)[-1]
        fill_one = leaf in ("scale", "var")
        out = np.ones_like(a64) if fill_one else np.zeros_like(a64)
        if "shared_head_conv" in name and leaf == "kernel":
            # kernel (1,1,in,out); in = concat of the 4 branches: block-
            # scatter W48 channels at each branch's W64 concat offset;
            # output dim trailing-pad first so non-scatter dims line up.
            pad_out = np.pad(
                a48, [(0, 0)] * (a48.ndim - 1)
                + [(0, a64.shape[-1] - a48.shape[-1])])
            return scatter_concat(out, pad_out, a48.ndim - 2, BR48, BR64)
        if "/mlp/" in name:
            # FiLM Dense emits [gamma(0:C) || beta(C:2C)]: pad each half.
            c48, c64 = a48.shape[-1] // 2, a64.shape[-1] // 2
            return scatter_concat(out, a48, a48.ndim - 1,
                                  (c48, c48), (c64, c64))
        sl = tuple(slice(0, s) for s in a48.shape)
        out[sl] = a48
        return out

    BR48 = (48, 96, 192, 384)
    BR64 = (64, 128, 256, 512)
    return jax.tree_util.tree_map_with_path(
        lambda path, a64, a48: pad(a48, a64, path), v64, v48)


def parity():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    tree, make = _models(jnp.float32)
    m48, _ = make(48)
    m64, _ = make(64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    v48 = m48.init(jax.random.PRNGKey(0), x, train=False)
    v64 = m64.init(jax.random.PRNGKey(1), x, train=False)
    v64p = _pad_tree(v48, v64)

    o48 = m48.apply(v48, x, train=False)
    o64 = m64.apply(v64p, x, train=False)
    for L in range(len(o48.logits_per_level)):
        np.testing.assert_allclose(
            np.asarray(o64.logits_per_level[L]),
            np.asarray(o48.logits_per_level[L]), rtol=1e-3, atol=1e-2,
            err_msg=f"level {L} logits")
    print("parity OK: zero-padded W64 == W48 outputs "
          "(fp-reassociation tolerance: rtol 1e-3, atol 1e-2)")


def bench_fwd(batch, img, steps):
    """Serving lever: forward-only latency, real W48 weights vs the SAME
    weights zero-padded into the W64 topology (quality-neutral per --parity).
    Answers whether MXU channel alignment pays at inference batch sizes."""
    import jax
    import jax.numpy as jnp

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tree, make = _models(jnp.bfloat16)
    m48, _ = make(48)
    m64, _ = make(64)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (batch, img, img, 3)).astype(np.float32)
    v48 = m48.init(jax.random.PRNGKey(0), x[:1], train=False)
    v64 = jax.eval_shape(lambda: m64.init(jax.random.PRNGKey(1), x[:1],
                                          train=False))
    v64 = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), v64)
    v64p = _pad_tree(v48, v64)

    out = {}
    for name, model, variables in (("w48", m48, v48), ("w64", m64, v64p)):
        fwd = jax.jit(lambda v, x, m=model: jnp.argmax(
            m.apply(v, x, train=False).logits_per_level[-1], -1))
        v_dev = jax.device_put(variables)
        xd = jax.device_put(x)  # one H2D: isolate compute, not tunnel I/O
        y = fwd(v_dev, xd)
        np.asarray(y)  # warm + sync
        t0 = time.time()
        for _ in range(steps):
            y = fwd(v_dev, xd)
        np.asarray(y)
        dt = (time.time() - t0) / steps
        out[f"{name}_fwd_ms"] = round(dt * 1e3, 3)
        print(json.dumps({f"{name}_fwd_ms": out[f"{name}_fwd_ms"]}),
              flush=True)
    out["w64_over_w48"] = round(out["w64_fwd_ms"] / out["w48_fwd_ms"], 3)
    out["batch"] = batch
    out["verdict"] = ("PACKED SERVING WINS (same weights, faster forward)"
                      if out["w64_over_w48"] < 1.0 else "no win at this shape")
    print(json.dumps(out))


def bench(batch, img, steps):
    import jax
    import jax.numpy as jnp

    cache = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    tree, make = _models(jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (batch, img, img, 3)).astype(np.float32)
    y = np.zeros((batch, img, img, tree.num_classes), np.float32)
    y[..., 0] = 1.0
    out = {}
    for width in (48, 64):
        model, _ = make(width)
        state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1],
                                       1e-3)
        step = make_train_step(model, tx, tree, hierarchical=True,
                               donate=False)
        mask = jnp.ones((tree.num_levels,), jnp.float32)
        # device_put ONCE: re-feeding host numpy each step would ship
        # ~270 MB/step (x+y at batch 16/620px) through the tunnel and bury
        # the w64-vs-w48 compute delta under a shared transfer constant
        xd, yd = jax.device_put(x), jax.device_put(y)
        _, aux = step(state, xd, yd, mask)
        float(aux["loss"])  # warm + sync (value fetch)
        t0 = time.time()
        for _ in range(steps):
            state2, aux = step(state, xd, yd, mask)
        float(aux["loss"])
        dt = (time.time() - t0) / steps
        out[f"w{width}_s_per_step"] = round(dt, 4)
        out[f"w{width}_img_s"] = round(batch / dt, 2)
        print(json.dumps({f"w{width}": out[f"w{width}_s_per_step"]}),
              flush=True)
    out["w64_over_w48"] = round(
        out["w64_s_per_step"] / out["w48_s_per_step"], 3)
    out["flop_ratio"] = round((64 / 48) ** 2, 3)
    out["verdict"] = ("PACKING WINS (sublinear in width — MXU pad waste "
                      "recovered)" if out["w64_over_w48"] < 1.33 else
                      "no win at this shape")
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--bench-fwd", action="store_true",
                    help="forward-only W48 vs packed-W64 latency (serving)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    if args.parity:
        parity()
    if args.bench:
        bench(args.batch, args.img, args.steps)
    if args.bench_fwd:
        bench_fwd(args.batch, args.img, args.steps)


if __name__ == "__main__":
    main()
