"""Prove the StableHLO export path on the real TPU chip.

Exports a trained checkpoint's serving forward (train/export.py), reloads the
artifact with bare jax, runs both the live Predictor and the deserialized
artifact on the chip, and reports argmax agreement + latency for each.
Timing uses value fetches (block_until_ready lies on this backend — NOTES).

Run post-sweep (the chip must be free):

    python tools/export_tpu_check.py \
        --weights .recipe/recipe_runs/hier_hrnet/fold_1/best.ckpt \
        --img-size 256

620px artifacts work the same way but pay a fresh remote compile for the
deserialized program (its HLO differs from the cached eval graphs); the
default 256px proves the path in minutes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=".recipe/recipe_runs/hier_hrnet/fold_1/best.ckpt")
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--model-select", type=int, default=1)
    ap.add_argument("--model-type", type=int, default=1)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/rhss_export_check")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
    from restrictive_hierarchical_semantic_segmentation_tpu.train.export import (
        export_predictor,
        load_exported,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import Predictor

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = RunConfig(
        tree_root=os.path.join(repo, "assets/class_tree_tl.json"),
        class_map=os.path.join(repo, "assets/class_map.csv"),
        model_select=args.model_select, model_type=args.model_type,
        img_size=args.img_size, compute_dtype=args.compute_dtype,
    )
    pred = Predictor(cfg, args.weights, outputs=("class_maps",))

    os.makedirs(args.out, exist_ok=True)
    art = os.path.join(args.out, f"model_{args.img_size}px.stablehlo")
    t0 = time.time()
    export_predictor(pred, art, platforms=(jax.default_backend(),))
    with open(art + ".json") as f:
        meta = json.load(f)
    print(f"exported {art}: {meta['artifact_bytes']/1e6:.1f} MB "
          f"in {time.time()-t0:.1f}s (platforms={meta['platforms']})")

    loaded = load_exported(art)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (args.batch, args.img_size, args.img_size, 3)
                    ).astype(np.float32)

    def timed(fn, label):
        out = fn(x)  # compile + warm
        lat = []
        for _ in range(args.iters):
            t = time.time()
            out = fn(x)  # __call__ fetches values -> real sync
            lat.append(time.time() - t)
        med = float(np.median(lat))
        print(f"{label}: median {med*1e3:.2f} ms over {args.iters} iters "
              f"(batch {args.batch})")
        return out, med

    got_live, ms_live = timed(pred, "live Predictor")
    got_art, ms_art = timed(loaded, "deserialized artifact")

    agrees = []
    for lvl, (a, b) in enumerate(zip(got_live["class_maps"],
                                     got_art["class_maps"])):
        agree = float((np.asarray(a) == np.asarray(b)).mean())
        agrees.append(agree)
        print(f"level {lvl} argmax agreement: {agree:.6f}")
    result = {
        "img_size": args.img_size, "batch": args.batch,
        "artifact_mb": meta["artifact_bytes"] / 1e6,
        "live_ms": ms_live * 1e3, "artifact_ms": ms_art * 1e3,
        "agreement": agrees,
    }
    print(json.dumps(result))
    ok = all(a >= 0.999 for a in agrees)
    print("EXPORT TPU CHECK:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
