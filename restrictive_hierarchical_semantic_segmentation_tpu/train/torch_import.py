"""Donor-checkpoint importer: PyTorch ``.pth`` -> Flax param/batch-stat trees.

Capability parity with the reference's two fuzzy loaders:

* HRNet ``init_weights`` (models.py:804-832): strip ``model./module./net./
  network.`` prefixes, exact-name then suffix match, shape-checked (intended
  for the published hrnet cocostuff / imagenet checkpoints);
* the UNet "in/up/down/out" key merger (train.py:470-505) for the milesial
  Pytorch-UNet carvana release.

Design: every Flax leaf path is translated to its expected torch name(s) by an
explicit structural map (exact, not guesswork); a reference-style shape-checked
suffix match is the fallback. Layout conversion: conv OIHW -> HWIO, linear
(O, I) -> (I, O). Unmatched leaves keep their Flax initialization — the
reference re-randomizes unmatched UNet weights U(-1, 1) (train.py:503), which
is strictly worse; this delta is deliberate and logged.

torch is used only here, host-side, for deserialization.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["load_torch_state_dict", "load_donor_weights", "translate_flax_path"]

_PREFIXES = ("model.", "module.", "net.", "network.")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        kk = k
        changed = True
        while changed:
            changed = False
            for p in _PREFIXES:
                if kk.startswith(p):
                    kk = kk[len(p):]
                    changed = True
        try:
            out[kk] = v.detach().cpu().numpy()
        except AttributeError:
            continue
    return out


def _bn_suffix(leaf: str, collection: str) -> Optional[str]:
    if collection == "params":
        return {"scale": "weight", "bias": "bias"}.get(leaf)
    return {"mean": "running_mean", "var": "running_var"}.get(leaf)


def translate_flax_path(
    path: Tuple[str, ...], collection: str, model_select: int
) -> List[str]:
    """Expected torch key(s) for a Flax leaf path (most-specific first)."""
    *mods, leaf = path
    name = "/".join(mods)
    name = re.sub(r"^backbone/?", "", name)

    def conv(tname: str) -> List[str]:
        return [f"{tname}.weight" if leaf == "kernel" else f"{tname}.bias"]

    def bn(tname: str) -> List[str]:
        sfx = _bn_suffix(leaf, collection)
        return [f"{tname}.{sfx}"] if sfx else []

    cands: List[str] = []
    if model_select == 0:  # UNet (milesial naming + reference naming)
        m = re.fullmatch(r"(inc|down\d|up\d)/conv/(conv|bn)(\d)", name) or \
            re.fullmatch(r"(inc)/(conv|bn)(\d)", name)
        if m:
            blockname, kind, idx = m.group(1), m.group(2), int(m.group(3))
            seq_idx = 0 if idx == 0 else 3
            if kind == "bn":
                seq_idx += 1
            for stem in _unet_stems(blockname):
                cands += conv(f"{stem}.{seq_idx}") if kind == "conv" else bn(
                    f"{stem}.{seq_idx}"
                )
    else:  # HRNet
        m = re.fullmatch(r"stem_(conv|bn)(\d)", name)
        if m:
            kind, i = m.group(1), int(m.group(2))
            # reference model naming: stem Sequential (models.py:578-585)
            seq = (0 if i == 0 else 3) + (1 if kind == "bn" else 0)
            cands += (conv if kind == "conv" else bn)(f"stem.{seq}")
            # upstream published-checkpoint naming: conv1/bn1/conv2/bn2
            t = f"{kind}{i + 1}"
            cands += conv(t) if kind == "conv" else bn(t)
        m = re.fullmatch(r"layer1/block(\d+)/(\w+)", name)
        if m:
            cands += _hrnet_block(f"layer1.{m.group(1)}", m.group(2), conv, bn)
        m = re.fullmatch(r"transition(\d)/t(\d+)_(conv|bn)(\d*)", name)
        if m:
            t, i, kind, j = m.groups()
            if j == "":  # simple Sequential(conv, bn, relu)
                seq = 0 if kind == "conv" else 1
                cands += (conv if kind == "conv" else bn)(
                    f"transition{t}.{i}.{seq}"
                )
            else:  # nested Sequential for new branches
                seq = 0 if kind == "conv" else 1
                cands += (conv if kind == "conv" else bn)(
                    f"transition{t}.{i}.{j}.{seq}"
                )
        m = re.fullmatch(r"stage(\d)_m(\d+)/branch(\d+)/block(\d+)/(\w+)", name)
        if m:
            s, mm, b, k, sub = m.groups()
            cands += _hrnet_block(
                f"stage{s}.{mm}.branches.{b}.{k}", sub, conv, bn
            )
        m = re.fullmatch(r"stage(\d)_m(\d+)/fuse(\d+)_(\d+)/(conv|bn)(\d*)", name)
        if m:
            s, mm, i, j, kind, k = m.groups()
            base = f"stage{s}.{mm}.fuse_layers.{i}.{j}"
            if k == "":  # upsample path: Sequential(conv, bn)
                seq = 0 if kind == "conv" else 1
                cands += (conv if kind == "conv" else bn)(f"{base}.{seq}")
            else:  # downsample chain: .{k}.(0 conv | 1 bn)
                seq = 0 if kind == "conv" else 1
                cands += (conv if kind == "conv" else bn)(f"{base}.{k}.{seq}")
        m = re.fullmatch(r"shared_head_(conv|bn)", name)
        if m:
            for stem in ("shared_head", "last_layer"):
                seq = 0 if m.group(1) == "conv" else 1
                cands += (conv if m.group(1) == "conv" else bn)(f"{stem}.{seq}")
    return cands


def _unet_stems(block: str) -> List[str]:
    if block == "inc":
        return ["inc.double_conv", "inc0.conv.conv", "inc.conv.conv"]
    if block.startswith("down"):
        return [f"{block}.maxpool_conv.1.double_conv", f"{block}.mpconv.1.conv"]
    return [f"{block}.conv.double_conv", f"{block}.conv.conv"]


def _hrnet_block(base: str, sub: str, conv, bn) -> List[str]:
    m = re.fullmatch(r"(conv|bn)(\d)", sub)
    if m:
        return (conv if m.group(1) == "conv" else bn)(f"{base}.{sub}")
    if sub == "downsample_conv":
        return conv(f"{base}.downsample.0")
    if sub == "downsample_bn":
        return bn(f"{base}.downsample.1")
    return []


def _convert(torch_arr: np.ndarray, flax_shape: tuple, leaf: str) -> Optional[np.ndarray]:
    a = torch_arr
    if leaf == "kernel":
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2:  # linear (O, I) -> (I, O)
            a = a.T
    if tuple(a.shape) != tuple(flax_shape):
        return None
    return a


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    root: dict = {}
    for path, v in flat.items():
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root


def _import_collection(sd, flat, collection, model_select, stats):
    import jax.numpy as jnp

    out = {}
    for path, leaf_val in flat.items():
        shape = tuple(np.shape(leaf_val))
        matched = None
        for cand in translate_flax_path(path, collection, model_select):
            if cand in sd:
                conv = _convert(sd[cand], shape, path[-1])
                if conv is not None:
                    matched = conv
                    break
        if matched is None:
            # reference-style suffix fallback (models.py:820-824), shape-checked
            tail = ".".join(path[-2:]).replace("/", ".")
            for k, v in sd.items():
                if k.endswith(tail):
                    conv = _convert(v, shape, path[-1])
                    if conv is not None:
                        matched = conv
                        break
        if matched is not None:
            out[path] = jnp.asarray(matched, dtype=np.asarray(leaf_val).dtype)
            stats["loaded"] += 1
        else:
            out[path] = leaf_val
            stats["missing"].append("/".join(path))
    return _unflatten(out)


def load_donor_weights(path: str, params, batch_stats=None, model_select: int = 1):
    """Import a donor ``.pth`` onto (params[, batch_stats]).

    Returns ``params`` or ``(params, batch_stats)`` depending on inputs;
    prints the reference-style coverage line (models.py:827)."""
    import flax

    sd = load_torch_state_dict(path)
    stats = {"loaded": 0, "missing": []}
    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    new_params = _import_collection(sd, _flatten(p), "params", model_select, stats)
    result_bs = None
    if batch_stats is not None:
        bs = (
            flax.core.unfreeze(batch_stats)
            if hasattr(batch_stats, "unfreeze")
            else dict(batch_stats)
        )
        result_bs = _import_collection(
            sd, _flatten(bs), "batch_stats", model_select, stats
        )
    total = stats["loaded"] + len(stats["missing"])
    print(f"Loaded {stats['loaded']} / {total} layers.")
    if stats["missing"]:
        print(f"Missing {len(stats['missing'])} layers (first 10): "
              f"{stats['missing'][:10]}")
    if batch_stats is not None:
        return new_params, result_bs
    return new_params
