"""On-chip per-op profile of the headline benchmark step (VERDICT r3 item 1).

Builds the EXACT bench.py step (shared ``bench.build_step`` — same jaxpr,
same persistent-compile-cache entry), traces N steps with ``jax.profiler``,
then parses the resulting ``*.trace.json.gz`` into a per-op accounting:

* top-K individual HLO ops by device time (name, category, ms/step, %,
  model GFLOPs, bytes accessed, achieved TFLOP/s and GB/s);
* category rollup (convolution fusion / fusion / copy / all-reduce / ...);
* device busy time per step vs wall step time (host/queue gap).

This replaces BENCHMARKS.md's inferred-bytes roofline argument with measured
per-op evidence. Output: a markdown table on stdout + a JSON dump.

Usage (same flags as bench.py, plus):
  python tools/profile_step.py --steps 5 --trace-steps 3 \
      --outdir /tmp/prof_620 --top 30 --json-out /tmp/prof_620/ops.json
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def parse_trace(trace_dir):
    """Return (events, n_module_execs) for TPU 'XLA Ops' events."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in ev if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n}
    tid_names = {(e["pid"], e.get("tid")): e["args"].get("name", "")
                 for e in ev if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    ops, modules = [], []
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if tname == "XLA Ops":
            ops.append(e)
        elif tname == "XLA Modules":
            modules.append(e)
    return ops, modules


def aggregate(ops, n_steps):
    """Aggregate per-op events over n_steps executions."""
    by_name = defaultdict(lambda: dict(dur=0.0, n=0, flops=0.0, bytes=0.0,
                                       category="", tf_op="", long_name=""))
    total = 0.0
    for e in ops:
        a = e.get("args", {})
        d = by_name[e["name"]]
        dur_ms = e.get("dur", 0.0) / 1e3  # trace dur is in us
        d["dur"] += dur_ms
        d["n"] += 1
        d["flops"] += float(a.get("model_flops", 0) or 0)
        d["bytes"] += float(a.get("raw_bytes_accessed",
                                  a.get("bytes_accessed", 0)) or 0)
        d["category"] = a.get("hlo_category", d["category"])
        d["tf_op"] = a.get("tf_op", d["tf_op"])
        if not d["long_name"]:
            d["long_name"] = a.get("long_name", "")[:220]
        total += dur_ms
    rows = []
    for name, d in by_name.items():
        per_step_ms = d["dur"] / n_steps
        fl = d["flops"] / n_steps
        by = d["bytes"] / n_steps
        rows.append(dict(
            name=name, category=d["category"], calls_per_step=d["n"] / n_steps,
            ms_per_step=per_step_ms,
            gflops_per_step=fl / 1e9,
            gbytes_per_step=by / 1e9,
            tflops_per_sec=(fl / (per_step_ms / 1e3) / 1e12
                            if per_step_ms else 0.0),
            gbytes_per_sec=(by / (per_step_ms / 1e3) / 1e9
                            if per_step_ms else 0.0),
            tf_op=d["tf_op"], long_name=d["long_name"],
        ))
    rows.sort(key=lambda r: -r["ms_per_step"])
    return rows, total / n_steps


def main():
    ap = bench.make_parser()
    ap.add_argument("--trace-steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/prof_step")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax

    built = bench.build_step(args)
    step, xd, yd, mask = built["step"], built["xd"], built["yd"], built["mask"]
    state, fetch_loss = built["state"], built["fetch_loss"]

    aux = None
    for _ in range(args.warmup):
        state, aux = step(state, xd, yd, mask)
    fetch_loss(aux)
    # wall timing (same protocol as bench.py)
    t0 = time.time()
    for _ in range(args.steps):
        state, aux = step(state, xd, yd, mask)
    fetch_loss(aux)
    wall_per_step = (time.time() - t0) / args.steps

    jax.profiler.start_trace(args.outdir)
    for _ in range(args.trace_steps):
        state, aux = step(state, xd, yd, mask)
    fetch_loss(aux)
    jax.profiler.stop_trace()

    ops, modules = parse_trace(args.outdir)
    # modules: one event per jitted-module execution; count train-step execs
    from collections import Counter
    mod_names = Counter(m["name"] for m in modules)
    n = args.trace_steps
    rows, device_ms = aggregate(ops, n)

    cat = defaultdict(lambda: dict(ms=0.0, gflops=0.0, gb=0.0, n=0))
    for r in rows:
        c = cat[r["category"] or "?"]
        c["ms"] += r["ms_per_step"]
        c["gflops"] += r["gflops_per_step"]
        c["gb"] += r["gbytes_per_step"]
        c["n"] += r["calls_per_step"]

    print(f"\n## Per-op profile: {'flat' if args.flat else 'hier'} "
          f"{args.model} {args.width} {args.img}px b{built['B']} "
          f"{args.dtype} ({n} traced steps)\n")
    print(f"wall {wall_per_step*1e3:.1f} ms/step | device busy "
          f"{device_ms:.1f} ms/step ({device_ms/(wall_per_step*1e3)*100:.1f}"
          f"% of wall) | module execs: {dict(mod_names)}\n")
    print("### Category rollup\n")
    print("| category | ops/step | ms/step | % device | GFLOP | GB | "
          "TF/s | GB/s |")
    print("|---|---|---|---|---|---|---|---|")
    for k, c in sorted(cat.items(), key=lambda kv: -kv[1]["ms"]):
        ms = c["ms"]
        print(f"| {k} | {c['n']:.0f} | {ms:.2f} | {ms/device_ms*100:.1f}% | "
              f"{c['gflops']:.1f} | {c['gb']:.2f} | "
              f"{c['gflops']/ms if ms else 0:.1f} | "
              f"{c['gb']/ms*1e3 if ms else 0:.0f} |")
    print(f"\n### Top {args.top} ops\n")
    print("| op | category | ms/step | % | GFLOP | GB | TF/s | GB/s | "
          "jax op |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows[:args.top]:
        print(f"| {r['name'][:48]} | {r['category']} | "
              f"{r['ms_per_step']:.3f} | "
              f"{r['ms_per_step']/device_ms*100:.1f}% | "
              f"{r['gflops_per_step']:.1f} | {r['gbytes_per_step']:.3f} | "
              f"{r['tflops_per_sec']:.1f} | {r['gbytes_per_sec']:.0f} | "
              f"{r['tf_op'][:70]} |")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(dict(wall_ms_per_step=wall_per_step * 1e3,
                           device_ms_per_step=device_ms,
                           rows=rows), f, indent=1)
        print(f"\n[json written to {args.json_out}]")


if __name__ == "__main__":
    main()
