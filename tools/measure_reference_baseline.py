"""One-time measurement of the reference's PyTorch-CPU train-step throughput.

Imports the reference model classes from /root/reference (read-only) and times
forward+backward+AdamW on CPU for the north-star config: hierarchical
HRNet-W48, 620x620, batch 4 (BASELINE.md). The shipped reference trainer
cannot run as committed (its get_loss call crashes — SURVEY.md §4 defect #1),
so the supervised per-level CE+Dice surrogate here stands in for the loss
head; the D backbone passes dominate the cost either way.

Writes BASELINE_MEASURED.json {"ref_cpu_images_per_sec": ...} for bench.py.
Usage: python tools/measure_reference_baseline.py [--steps 2] [--img 620]
"""
import argparse
import json
import os
import sys
import time

REF = "/root/reference"


class AttrDict(dict):
    """yacs-lite: dict with attribute access (reference config.MODEL.EXTRA is
    consumed both as extra['STAGE1'] and extra.FINAL_CONV_KERNEL)."""

    def __getattr__(self, k):
        v = self[k]
        return AttrDict(v) if isinstance(v, dict) and not isinstance(v, AttrDict) else v


def hrnet_w48_cfg():
    stage = lambda m, b, blocks, chans, blk: AttrDict(
        NUM_MODULES=m, NUM_BRANCHES=b, BLOCK=blk, NUM_BLOCKS=blocks,
        NUM_CHANNELS=chans, FUSE_METHOD="SUM",
    )
    return AttrDict(
        MODEL=AttrDict(
            ALIGN_CORNERS=True,
            EXTRA=AttrDict(
                FINAL_CONV_KERNEL=1,
                STAGE1=stage(1, 1, [4], [64], "BOTTLENECK"),
                STAGE2=stage(1, 2, [4, 4], [48, 96], "BASIC"),
                STAGE3=stage(4, 3, [4, 4, 4], [48, 96, 192], "BASIC"),
                STAGE4=stage(3, 4, [4, 4, 4, 4], [48, 96, 192, 384], "BASIC"),
            ),
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--img", type=int, default=620)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    import types

    import torch

    sys.path.insert(0, REF)
    # stub the reference's vestigial `timm` import (unused by the active code)
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit._cfg = lambda *a, **k: {}
    timm.models = timm_models
    timm_models.vision_transformer = timm_vit
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.vision_transformer", timm_vit)
    import json as _json

    from Models import models as ref_models  # noqa: E402 (reference, read-only)

    tree = _json.load(open(os.path.join(REF, "class_tree_tl.json")))
    model = ref_models.HighResolutionNet(
        config=hrnet_w48_cfg(), hierarchy=tree, model_type=1
    )
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    B, S = args.batch, args.img
    x = torch.randn(B, 3, S, S)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference hier-HRNet params: {n_params/1e6:.1f}M")

    def step():
        opt.zero_grad()
        probs, logits = model(x)
        loss = sum(torch.log_softmax(z, 1).mean() for z in logits)
        loss = loss + sum(p.mean() for p in probs)
        (-loss).backward()
        opt.step()

    for _ in range(args.warmup):
        t = time.time()
        step()
        print(f"warmup step: {time.time()-t:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.steps):
        step()
        print(f"step done t={time.time()-t0:.1f}s", flush=True)
    dt = (time.time() - t0) / args.steps
    ips = B / dt
    out = {
        "ref_cpu_images_per_sec": ips,
        "ref_cpu_sec_per_step": dt,
        "batch": B,
        "img_size": S,
        "params": n_params,
        "host": os.uname().nodename,
        "note": "reference hier-HRNet-W48 fwd+bwd+AdamW, torch CPU",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
