"""Dimension-aware speed-of-light bound for the compiled train step.

"20% MFU" is only meaningful against the *achievable* ceiling: v5e's MXU is a
128x128 systolic array, so a conv whose implicit-GEMM N (=C_out) or K
(=kh*kw*C_in) underfills 128 lanes cannot reach peak no matter how it is
scheduled — HRNet-W48's branch widths (48/96 channels) cap large parts of the
model far below 197 TF/s. This tool parses every convolution/dot out of the
OPTIMIZED HLO of the jitted train step, computes each op's padding-aware MXU
compute bound and HBM traffic bound, and combines them with the residual
(non-matmul) HBM traffic from XLA's cost analysis into an achievable
step-time bound:

    T_bound = sum_ops max(flops / (PEAK * eff_pad), bytes_op / BW)
              + residual_bytes / BW

where eff_pad = (N/ceil128(N)) * (K/ceil128(K)). This assumes perfect
scheduling and no overlap of matmul HBM traffic with other ops' compute —
a true lower bound on neither side, but a far more honest ceiling than
flops/PEAK. Compares against a bench.py measurement you pass via --measured.

Run (warm cache makes the compile instant):
    python tools/roofline.py [--batch 16] [--img 620] [--measured 0.450]
"""
import argparse
import json
import math
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PEAK_BF16 = 197e12   # v5e MXU peak, bf16
PEAK_F32 = 49e12     # v5e f32 (4x below bf16)
HBM_BW = 819e9       # v5e HBM bandwidth

_DTYPE_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s8": 1, "u8": 1,
                "s32": 4, "u32": 4, "pred": 1, "s16": 2, "u16": 2}

# every HLO instruction line: %name = dtype[d0,d1,...]{layout} opcode(...)
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+) = (\w+)\[([\d,]*)\]")
_CONV_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w.\-]+) = (\w+)\[([\d,]*)\][^=]*?"
    r" convolution\(%([\w.\-]+), %([\w.\-]+)\)(.*)$"
)
_DOT_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w.\-]+) = (\w+)\[([\d,]*)\][^=]*?"
    r" dot\(%([\w.\-]+), %([\w.\-]+)\)(.*)$"
)
_WINDOW_RE = re.compile(r"window=\{size=([\dx]+)")
_LABELS_RE = re.compile(r"dim_labels=(\S+?)(?:,|\s|$)")
_LHS_CDIMS_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")


def _ceil_pad_eff(n: int, tile: int = 128) -> float:
    return n / (math.ceil(n / tile) * tile)


def _nbytes(dtype: str, dims) -> int:
    return _DTYPE_BYTES.get(dtype, 4) * (math.prod(dims) if dims else 1)


def _split_labels(labels: str):
    """'f01b_i01o->01bf' -> per-operand label strings (lhs, rhs, out)."""
    lhs, rest = labels.split("_", 1)
    rhs, out = rest.split("->")
    return lhs, rhs, out


def parse_matmul_ops(hlo_text: str):
    """Dicts {kind, M, N, K, flops, bytes, dtype} for every conv/dot.

    Shapes of operands are resolved through a name->shape table built from
    the whole module (optimized HLO references operands by name only).
    Conv FLOPs follow XLA's HloCostAnalysis convention:
    2 * prod(out) * prod(window) * C_in_per_group (rhs 'i' dim). The GEMM
    mapping for MXU efficiency: N = out feature dim, K = window * rhs_i.
    """
    shapes = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if m:
            name, dt, dims = m.groups()
            shapes[name] = (dt, [int(v) for v in dims.split(",") if v])
    ops = []
    for line in hlo_text.splitlines():
        m = _CONV_RE.match(line)
        if m:
            name, odt, oshape, lhs_n, rhs_n, tail = m.groups()
            out = [int(v) for v in oshape.split(",") if v]
            lm = _LABELS_RE.search(tail)
            wm = _WINDOW_RE.search(tail)
            if not lm or rhs_n not in shapes:
                continue
            _, rlab, olab = _split_labels(lm.group(1))
            rdt, rshape = shapes[rhs_n]
            window = (math.prod(int(v) for v in wm.group(1).split("x"))
                      if wm else 1)
            # rhs label chars map positionally to rhs dims ('i' = per-group
            # input features, 'o' = output features)
            ci = rshape[rlab.index("i")] if "i" in rlab else 1
            N = out[olab.index("f")] if "f" in olab else 1
            K = window * ci
            M = math.prod(out) // max(1, N)
            lbytes = (_nbytes(*shapes[lhs_n]) if lhs_n in shapes else 0)
            ops.append({
                "kind": "conv", "M": M, "N": N, "K": K,
                "flops": 2.0 * M * N * K,
                "bytes": _nbytes(odt, out) + lbytes + _nbytes(rdt, rshape),
                "dtype": odt,
            })
            continue
        m = _DOT_RE.match(line)
        if m:
            name, odt, oshape, lhs_n, rhs_n, tail = m.groups()
            out = [int(v) for v in oshape.split(",") if v]
            cm = _LHS_CDIMS_RE.search(tail)
            if lhs_n not in shapes:
                continue
            ldt, lshape = shapes[lhs_n]
            contract = ([int(v) for v in cm.group(1).split(",") if v]
                        if cm else [len(lshape) - 1])
            K = math.prod(lshape[i] for i in contract) if contract else 1
            M = math.prod(lshape) // max(1, K)
            N = math.prod(out) // max(1, M)
            rbytes = (_nbytes(*shapes[rhs_n]) if rhs_n in shapes else 0)
            ops.append({
                "kind": "dot", "M": M, "N": N, "K": K,
                "flops": 2.0 * M * N * K,
                "bytes": _nbytes(odt, out) + _nbytes(ldt, lshape) + rbytes,
                "dtype": odt,
            })
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--model", default="hrnet", choices=["hrnet", "unet"])
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--measured", type=float, default=None,
                    help="measured sec/step from bench.py for the same config")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from restrictive_hierarchical_semantic_segmentation_tpu.utils.compile_cache import (  # noqa: E501
        enable as enable_compile_cache,
    )

    enable_compile_cache()

    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
        ClassTree,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (  # noqa: E501
        build_model,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    tree = ClassTree.from_json(
        os.path.join(HERE, "assets", "class_tree_tl.json"),
        os.path.join(HERE, "assets", "class_map.csv"),
    )
    model = build_model(
        tree, model_select=1 if args.model == "hrnet" else 0,
        model_type=0 if args.flat else 1, dtype=jnp.bfloat16,
    )
    B, S = args.batch, args.img
    x = np.zeros((B, S, S, 3), np.float32)
    n_classes = tree.num_classes if not args.flat else tree.num_leaves
    y = np.zeros((B, S, S, n_classes), np.float32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], 0.018)
    step = make_train_step(model, tx, tree, hierarchical=not args.flat,
                           donate=False)
    mask = jnp.ones((tree.num_levels if not args.flat else 1,), jnp.float32)
    compiled = jax.jit(step).lower(state, x, y, mask).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    hlo = compiled.as_text()
    ops = parse_matmul_ops(hlo)

    t_mm, mm_flops, mm_bytes = 0.0, 0.0, 0.0
    eff_hist = {}
    for op in ops:
        peak = PEAK_BF16 if op["dtype"] == "bf16" else PEAK_F32
        eff = _ceil_pad_eff(op["N"]) * _ceil_pad_eff(op["K"])
        t_c = op["flops"] / (peak * eff)
        t_m = op["bytes"] / HBM_BW
        t_mm += max(t_c, t_m)
        mm_flops += op["flops"]
        mm_bytes += op["bytes"]
        key = f"N{op['N']}"
        eff_hist.setdefault(key, [0, 0.0])
        eff_hist[key][0] += 1
        eff_hist[key][1] += op["flops"]

    total_bytes = ca.get("bytes accessed", 0.0)
    total_flops = ca.get("flops", 0.0)
    residual_bytes = max(0.0, total_bytes - mm_bytes)
    t_bound = t_mm + residual_bytes / HBM_BW

    out = {
        "config": f"{'flat' if args.flat else 'hier'}_{args.model}_{S}px_b{B}",
        "n_matmul_ops": len(ops),
        "matmul_TF": round(mm_flops / 1e12, 2),
        "total_TF_cost_analysis": round(total_flops / 1e12, 2),
        "matmul_GB": round(mm_bytes / 1e9, 1),
        "total_GB_cost_analysis": round(total_bytes / 1e9, 1),
        "naive_bound_s": round(total_flops / PEAK_BF16, 4),
        "matmul_bound_s": round(t_mm, 4),
        "achievable_bound_s": round(t_bound, 4),
        "flops_by_Cout": {
            k: {"ops": v[0], "TF": round(v[1] / 1e12, 2),
                "mxu_eff": round(_ceil_pad_eff(int(k[1:])), 3)}
            for k, v in sorted(eff_hist.items(),
                               key=lambda kv: -kv[1][1])[:8]
        },
    }
    if args.measured:
        out["measured_s"] = args.measured
        out["pct_of_achievable"] = round(100 * t_bound / args.measured, 1)
        out["naive_mfu_pct"] = round(
            100 * total_flops / (args.measured * PEAK_BF16), 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
