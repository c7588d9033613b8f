"""Headline benchmark: hierarchical HRNet-W48 train-step throughput at the
reference's north-star config (620x620, batch 4, BASELINE.md) on the available
TPU chip(s).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images_per_sec_per_chip",
   "vs_baseline": N}

``vs_baseline`` compares against the PyTorch-CPU reference throughput measured
by ``tools/measure_reference_baseline.py`` (stored in BASELINE_MEASURED.json —
the reference repo publishes no throughput numbers, BASELINE.md).

Flags: --model {hrnet,unet} --img 620 --batch 4 --steps 20 --dtype bfloat16

``make_parser``/``build_step`` are importable so tools (tools/profile_step.py)
profile the EXACT benchmark step — same jaxpr, same compile-cache entry.
"""
import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def make_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hrnet", choices=["hrnet", "unet"])
    ap.add_argument("--img", type=int, default=620)
    # batch 16 is the single-chip throughput-optimal point (BENCHMARKS.md:
    # 0.450 s/step = 35.6 img/s vs 24.2 at the reference recipe's batch 4;
    # fits HBM without remat). detail.global_batch records it.
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--remat", nargs="?", const="module", default=None,
                    choices=["module", "conv"],
                    help="rematerialization: bare/--remat module = full "
                         "per-module recompute; --remat conv = save conv "
                         "outputs, recompute elementwise tails only")
    ap.add_argument("--pallas-bn", action="store_true",
                    help="fused Pallas BN+act kernels in the backbone")
    ap.add_argument("--tree", default="default", choices=["default", "extended"],
                    help="extended = the depth-4 tree (reference pays 4 "
                         "backbone passes; the shared pass pays one)")
    ap.add_argument("--width", default="w48",
                    choices=["w18", "w32", "w48", "w64"],
                    help="HRNet width family (reference MODEL_CONFIGS "
                         "+ the TPU-native w64 preset)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help=">1: one optimizer step from N microbatches "
                         "(peak memory of one microbatch)")
    ap.add_argument("--folds", type=int, default=1,
                    help=">1: fold-parallel mode — N independent model "
                         "replicas (cross-val folds) trained in one "
                         "shard_map/vmap step, fold axis over the mesh; "
                         "value reports AGGREGATE images/sec/chip")
    ap.add_argument("--resize-method", default="auto",
                    choices=["auto", "gather", "matmul"],
                    help="bilinear-resize formulation (ops/resize.py): "
                         "gather/lerp passes vs the gather-free banded-"
                         "matmul contraction (MXU instead of gather path). "
                         "auto = the platform default (matmul on TPU — "
                         "measured 0.362 vs 0.421 s/step, BENCHMARKS r4)")
    return ap


def build_step(args):
    """Build the benchmark's jitted train step + device-resident inputs.

    Returns dict with: step, state, xd, yd, mask, B (per-fold global batch),
    n_chips, fetch_loss. Identical construction to what main() times, so a
    compile here warms the persistent cache for the headline run.
    """
    import jax

    # persistent compilation cache: the 620px hier-HRNet graph is large and
    # cold-compiles take many minutes over the remote-compile tunnel
    cache_dir = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    if args.resize_method != "auto":
        from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import (  # noqa: E501
            set_default_method,
        )

        set_default_method(args.resize_method)

    tree_file = ("class_tree_tl_extended.json" if args.tree == "extended"
                 else "class_tree_tl.json")
    map_file = ("class_map_extended.csv" if args.tree == "extended"
                else "class_map.csv")
    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", tree_file),
        os.path.join(HERE, "assets", map_file),
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    hrnet_cfg = None
    if args.model == "hrnet" and args.width != "w48":
        from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
            resolve_hrnet_config,
        )

        hrnet_cfg = resolve_hrnet_config(args.width)
    model = build_model(
        tree,
        model_select=1 if args.model == "hrnet" else 0,
        model_type=0 if args.flat else 1,
        hrnet_config=hrnet_cfg,
        dtype=dtype,
        remat=args.remat or False,
        use_pallas_bn=args.pallas_bn,
    )
    n_chips = len(jax.devices())
    if args.folds > 1:
        # per-chip batch must stay at args.batch: each fold group only gets
        # n_chips/F chips, so the per-fold global batch scales with the fold
        # group's data x space extent, not the whole machine
        from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (  # noqa: E501
            make_fold_mesh,
        )

        mesh = make_fold_mesh(args.folds, args.batch)
        n_chips = mesh.devices.size  # idle chips don't count in per-chip rate
        B = args.batch * mesh.devices.shape[1] * mesh.devices.shape[2]
    else:
        mesh = make_mesh()  # all chips on the data axis
        B = args.batch * max(1, n_chips)
    S = args.img

    # realistic batches straight from the target factory (works for any tree
    # whose leaves use the TL-pano pixel coding — both shipped trees do)
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        synth_sample,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.target_factory import (
        leaf_masks,
        node_masks,
        ternary_encode,
    )

    rng = np.random.default_rng(0)
    xs, ys = [], []
    for i in range(B):
        img, mask = synth_sample(rng, S)
        xs.append(((np.stack((img,) * 3, -1).astype(np.float32) / 255.0)
                   - 0.5) / 0.5)
        if args.flat:
            ys.append(leaf_masks(mask, tree).astype(np.float32))
        else:
            ys.append(ternary_encode(
                node_masks(mask, tree).astype(np.float32), tree))
    x = np.stack(xs)
    y = np.stack(ys)

    # reference recipe weights (README.md:71-91) for the default tree
    if args.tree == "extended":
        lw = None
    else:
        lw = (
            [[0.0297, 1.577, 0.9619, 0.1770], [1.5432, 0.2638, 1.0413, 3.9722]]
            if not args.flat
            else [[0.0285, 1.5159, 0.9227, 1.4842, 0.2532, 1.0, 3.8021]]
        )

    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), x[:1], lr=0.018
    )
    if args.folds > 1:
        # fold-parallel step (train/fold_parallel.py construction): fold axis
        # manual over the mesh, data/space auto inside each fold group
        from jax.sharding import NamedSharding, PartitionSpec as P

        from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (  # noqa: E501
            DATA_AXIS, FOLD_AXIS, SPACE_AXIS,
        )

        F = args.folds
        state = jax.device_put(
            jax.tree_util.tree_map(lambda l: jnp.stack([l] * F), state),
            NamedSharding(mesh, P(FOLD_AXIS)),
        )
        fold_batch = NamedSharding(
            mesh, P(FOLD_AXIS, DATA_AXIS, SPACE_AXIS, None, None))
        xd = jax.device_put(np.stack([x] * F), fold_batch)
        yd = jax.device_put(np.stack([y] * F), fold_batch)
        raw = make_train_step(
            model, tx, tree, hierarchical=not args.flat, level_weights=lw,
            jit=False, grad_accum=args.grad_accum,
        )
        step = jax.jit(
            jax.shard_map(
                jax.vmap(raw, in_axes=(0, 0, 0, None)),
                mesh=mesh,
                in_specs=(P(FOLD_AXIS), P(FOLD_AXIS), P(FOLD_AXIS), P()),
                out_specs=(P(FOLD_AXIS), P(FOLD_AXIS)),
                axis_names=frozenset({FOLD_AXIS}),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
    else:
        state = jax.device_put(state, replicated(mesh))
        xd = jax.device_put(x, batch_sharding(mesh))
        yd = jax.device_put(y, batch_sharding(mesh))
        step = make_train_step(
            model, tx, tree, hierarchical=not args.flat, level_weights=lw,
            grad_accum=args.grad_accum,
        )
    mask = jnp.ones((tree.num_levels if not args.flat else 1,), jnp.float32)

    def fetch_loss(aux):
        # NB: on this tunneled backend jax.block_until_ready() returns
        # without draining the execution queue — the only reliable
        # synchronization is an actual value fetch. The final loss depends
        # (by dataflow) on every previous step's parameter update, so
        # fetching it times the whole chain; the transfer is microseconds.
        # Mean over folds keeps the field comparable to single-fold runs.
        return float(np.asarray(jax.device_get(aux["loss"])).mean())

    return {
        "step": step, "state": state, "xd": xd, "yd": yd, "mask": mask,
        "B": B, "n_chips": n_chips, "fetch_loss": fetch_loss,
    }


def _resolved_resize_method(flag: str) -> str:
    from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import (
        get_default_method,
    )

    return get_default_method() if flag == "auto" else flag


def main():
    args = make_parser().parse_args()
    built = build_step(args)
    step, xd, yd, mask = built["step"], built["xd"], built["yd"], built["mask"]
    state, fetch_loss = built["state"], built["fetch_loss"]
    B, n_chips = built["B"], built["n_chips"]

    aux = None
    for _ in range(args.warmup):
        state, aux = step(state, xd, yd, mask)
    if aux is not None:
        fetch_loss(aux)
    t0 = time.time()
    for _ in range(args.steps):
        state, aux = step(state, xd, yd, mask)
    loss_val = fetch_loss(aux)
    dt = (time.time() - t0) / args.steps
    ips = B * args.folds / dt
    ips_per_chip = ips / max(1, n_chips)

    vs = None
    baseline_path = os.path.join(HERE, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        if ref.get("ref_cpu_images_per_sec"):
            vs = ips_per_chip / ref["ref_cpu_images_per_sec"]

    S = args.img
    print(json.dumps({
        "metric": f"{'flat' if args.flat else 'hier'}_{args.model}"
                  f"{'' if args.model != 'hrnet' or args.width == 'w48' else '_' + args.width}"
                  f"{'' if args.folds <= 1 else f'_folds{args.folds}'}"
                  f"{'' if args.grad_accum <= 1 else f'_ga{args.grad_accum}'}"
                  f"{'' if args.resize_method == 'auto' else '_' + args.resize_method + 'resize'}"
                  f"_{S}px_b{B}_train_step_throughput",
        "value": round(ips_per_chip, 3),
        "unit": "images_per_sec_per_chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "sec_per_step": round(dt, 4),
            "global_batch": B * args.folds,
            "n_chips": n_chips,
            "dtype": args.dtype,
            "loss": loss_val,
            # resolved op config, so cross-round metric rows are comparable
            # even when the 'auto' default flips (r1-r3 gather, r4+ matmul
            # on TPU — see BENCHMARKS.md)
            "resize_method": _resolved_resize_method(args.resize_method),
        },
    }))


if __name__ == "__main__":
    main()
