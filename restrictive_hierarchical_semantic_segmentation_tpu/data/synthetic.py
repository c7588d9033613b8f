"""Synthetic TL-pano-like data generator (for tests, smoke training, benches).

The real dataset (194 panoramic radiographs, pixel-coded masks per
class_map.csv) is not redistributable; this generates structurally-equivalent
samples: a grayscale "radiograph" with jaw bands (upper/lower) and elliptical
"teeth" whose interiors are partitioned into pulp/dentin/enamel(/composite)
rings, encoded with the exact class_map pixel values so the full target
factory path is exercised.
"""
from __future__ import annotations

import os
from typing import Tuple

import cv2
import numpy as np

from ..hierarchy.tree import ClassTree

__all__ = ["synth_sample", "write_synth_dataset"]


def synth_sample(
    rng: np.random.Generator, size: int = 128, hard: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (image uint8 (S,S), mask uint8 (S,S)) with class_map pixel codes:
    background=0, upper=212, lower=255, pulp=127, dentin=170, enamel=85,
    composite=42.

    ``hard=True`` (the full-recipe accuracy-table mode, tools/
    make_synth_tlpano.py) makes the task test the capability the paper
    actually claims (README.md:10-12): it scatters distractor blobs OUTSIDE
    the tooth classes whose luminance mimics the tooth-interior classes
    (pulp/dentin/enamel/composite), and jitters the per-image luminance map.
    Appearance alone then no longer identifies a fine class — a pulp-looking
    blob in the jaw bone is NOT pulp — which is precisely the false-positive
    mode the restrictive composition ``P_child = P_parent * Q`` suppresses
    structurally (child probability gated by the parent mask,
    models.py:296-297) while a flat leaf softmax must learn it from data.
    Default ``False`` keeps the easy, near-separable rendering for smoke
    tests and benches."""
    s = size
    mask = np.zeros((s, s), np.uint8)
    mid = s // 2
    # jaw bands
    uh = int(rng.uniform(0.12, 0.2) * s)
    lh = int(rng.uniform(0.12, 0.2) * s)
    mask[mid - uh : mid, :] = 212  # upper
    mask[mid : mid + lh, :] = 255  # lower
    # teeth: ellipses straddling the jaw line
    n_teeth = int(rng.integers(3, 7))
    for i in range(n_teeth):
        cx = int((i + 0.5 + rng.uniform(-0.1, 0.1)) * s / n_teeth)
        cy = mid + int(rng.uniform(-0.3, 0.3) * uh)
        a = max(3, int(s / (n_teeth * 2.6)))
        b = max(5, int(rng.uniform(0.1, 0.16) * s))
        # enamel shell, dentin body, pulp core (concentric)
        cv2.ellipse(mask, (cx, cy), (a, b), 0, 0, 360, 85, -1)
        cv2.ellipse(mask, (cx, cy), (int(a * 0.75), int(b * 0.75)), 0, 0, 360,
                    170, -1)
        cv2.ellipse(mask, (cx, cy), (max(1, int(a * 0.3)), max(2, int(b * 0.3))),
                    0, 0, 360, 127, -1)
        if rng.uniform() < 0.3:  # occasional composite filling
            cv2.ellipse(mask, (cx, cy - b // 2),
                        (max(1, a // 3), max(1, b // 5)), 0, 0, 360, 42, -1)
    # image: noisy rendering of the anatomy
    img = np.zeros((s, s), np.float32)
    lum_map = {212: 90.0, 255: 110.0, 170: 170.0, 85: 220.0, 127: 60.0,
               42: 240.0}
    if hard:
        # per-image global + per-class luminance jitter: defeats pure
        # per-pixel thresholding across the dataset
        g = rng.uniform(-20, 20)
        lum_map = {pv: lum + g + rng.uniform(-10, 10)
                   for pv, lum in lum_map.items()}
    for pv, lum in lum_map.items():
        img[mask == pv] = lum
    if hard:
        # distractor blobs OUTSIDE the tooth classes, rendered with
        # tooth-interior luminances (pulp/dentin/enamel/composite lookalikes
        # in the background and jaw bone). They change the IMAGE only — the
        # mask keeps its true class — so fine-class appearance is ambiguous
        # without the parent context the hierarchy encodes.
        dist = np.zeros((s, s), np.float32)
        for _ in range(int(rng.integers(6, 14))):
            dx = int(rng.uniform(0.03, 0.97) * s)
            dy = int(rng.uniform(0.03, 0.97) * s)
            da = max(2, int(rng.uniform(0.015, 0.06) * s))
            db = max(3, int(rng.uniform(0.02, 0.09) * s))
            ang = float(rng.uniform(0, 180))
            lum = float(lum_map[int(rng.choice([127, 170, 85, 42]))]
                        + rng.uniform(-8, 8))
            cv2.ellipse(dist, (dx, dy), (da, db), ang, 0, 360, lum, -1)
        outside_teeth = ~np.isin(mask, (85, 170, 127, 42))
        hit = outside_teeth & (dist > 0)
        img[hit] = dist[hit]
    img += rng.normal(0, 12, (s, s)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return np.clip(img, 0, 255).astype(np.uint8), mask


def write_synth_dataset(
    root: str, n: int, size: int = 128, seed: int = 0, folds: int = 0
) -> None:
    """Write images/ + labels/ PNG pairs; with ``folds>0``, write the
    reference's cross-val layout ``root/fold_N/{train,val}/{images,labels}``
    (train.py:796-803)."""
    rng = np.random.default_rng(seed)

    def write_split(d: str, count: int):
        os.makedirs(os.path.join(d, "images"), exist_ok=True)
        os.makedirs(os.path.join(d, "labels"), exist_ok=True)
        for i in range(count):
            img, mask = synth_sample(rng, size)
            cv2.imwrite(os.path.join(d, "images", f"{i:04d}.png"), img)
            cv2.imwrite(os.path.join(d, "labels", f"{i:04d}.png"), mask)

    if folds <= 0:
        write_split(root, n)
    else:
        for f in range(1, folds + 1):
            write_split(os.path.join(root, f"fold_{f}", "train"), n)
            write_split(os.path.join(root, f"fold_{f}", "val"), max(2, n // 4))
