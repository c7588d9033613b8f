"""SegDataset: image+mask decode -> transforms -> paired aug -> targets.

Behavioral equivalent of the reference ``SegDataset`` (Data/dataset.py:12-476)
with the pipeline order preserved exactly:

1. decode image (gray -> 3ch stack, dataset.py:416-417) and pixel-coded mask;
2. per-node binary channels in canonical order (flat: leaves only);
3. input chain: [0,1] -> resize -> (train: blur, jitter) -> normalize(.5,.5);
4. target chain: per-channel [0,1] -> resize;
5. paired hflip (p=.5) and paired random affine (train only), reference fill
   conventions (image -1; target channel 0 fills with its max, others -1);
6. re-binarize targets at 0.5 (dataset.py:454-455);
7. hierarchical mode: ternary restrictive encoding.

Outputs NHWC float32: image (S, S, 3), target (S, S, C_total).
Randomness is an explicit ``np.random.Generator`` (reproducible per
epoch/index) instead of torch's global RNG.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np

from ..hierarchy.tree import ClassTree
from . import transforms as T
from .target_factory import leaf_masks, node_masks, ternary_encode

__all__ = ["SegDataset", "decode_image", "decode_mask"]


def decode_image(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = np.stack((img,) * 3, axis=-1)  # dataset.py:416-417
    elif img.shape[2] == 4:
        img = img[..., :3]
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def decode_image_compact(path: str) -> np.ndarray:
    """Like :func:`decode_image` but keeps grayscale sources single-channel
    (H, W, 1). Every input-chain op is channel-symmetric, so processing one
    channel and broadcasting to 3 at the end equals the reference's
    stack-first order (dataset.py:416-417) at a third of the bandwidth."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    return _compact_channels(img)


def decode_image_bytes_compact(data: bytes) -> np.ndarray:
    """:func:`decode_image_compact` for in-memory encoded bytes (the serve
    CLI's upload path) — SAME channel conventions, one implementation."""
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError("not a decodable image")
    return _compact_channels(img)


def _compact_channels(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img[..., None]
    if img.shape[2] == 4:
        return img[..., :3]
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def decode_mask(path: str) -> np.ndarray:
    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if m is None:
        raise FileNotFoundError(path)
    return m


class ByteCappedCache:
    """Insert-until-full numpy-array cache bounded by TOTAL BYTES.

    Per-image caches here are hit once per (index, size) per epoch, so
    eviction would only thrash: once the byte budget is spent, further keys
    are simply not cached (re-decoded per epoch, like the reference does for
    everything). A plain dict with an entry-count cap is not a real bound —
    4096 entries of 620px float images would be ~19 GB on a small host."""

    def __init__(self, cap_bytes: int):
        self.cap_bytes = int(cap_bytes)
        self.nbytes = 0
        self._d: dict = {}

    def get(self, key, default=None):
        return self._d.get(key, default)

    def __contains__(self, key) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def __setitem__(self, key, value):
        if key in self._d:
            return
        nb = int(getattr(value, "nbytes", 0))
        if self.nbytes + nb > self.cap_bytes:
            return
        self._d[key] = value
        self.nbytes += nb


class SegDataset:
    def __init__(
        self,
        input_paths: List[str],
        target_paths: List[str],
        tree: ClassTree,
        img_size: int,
        hierarchical: bool,
        augment: bool,
        hflip: bool = True,
        vflip: bool = False,
        affine: bool = True,
        use_native: bool = True,
        target_dtype=np.float32,
        emit_gray: bool = False,
        cache_bytes: int = 1 << 30,
    ):
        assert len(input_paths) == len(target_paths)
        self.input_paths = list(input_paths)
        self.target_paths = list(target_paths)
        self.tree = tree
        self.img_size = int(img_size)
        self.hierarchical = hierarchical
        self.augment = augment
        self.hflip = hflip
        self.vflip = vflip
        self.affine = affine
        self.use_native = use_native
        # int8 targets: ternary {-1,0,1} is exact in int8 — 4x smaller host
        # buffers and host->device transfers; the jitted steps upcast on device
        self.target_dtype = target_dtype
        # emit_gray: keep grayscale sources single-channel (S, S, 1); the
        # jitted steps broadcast to the reference's 3-channel layout on device
        # (3x smaller image transfer)
        self.emit_gray = emit_gray
        self._tables = None
        # augmentation-independent per-image caches, reused across epochs:
        # channel bitmasks (("bits", index, size) -> (S, S) uint32,
        # ~1.5MB/img @620) and decoded+resized [0,1] images (("img", index,
        # size), ~4.6MB/img @620). The reference re-decodes every epoch;
        # identical values, just cached. ONE byte-capped cache shared by both
        # kinds so ``cache_bytes`` is the dataset's TOTAL host-RAM budget
        # (entry-count caps are not a real bound on a small host: 4096
        # entries at 620px would be ~19 GB); past the cap new images are
        # simply re-decoded per epoch, reference-style.
        self._cache = ByteCappedCache(cache_bytes)
        # both names point at the same byte budget (back-compat aliases)
        self._bits_cache = self._cache
        self._img_cache = self._cache
        self.cache_images = True

    def __len__(self) -> int:
        return len(self.input_paths)

    @property
    def num_target_channels(self) -> int:
        return self.tree.num_classes if self.hierarchical else self.tree.num_leaves

    def _target_tables(self):
        if self._tables is None:
            from .native import ChannelTables

            self._tables = ChannelTables(self.tree, self.hierarchical)
        return self._tables

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        if rng is None:
            rng = np.random.default_rng()
        s = self.img_size
        x = self._cache.get(("img", index, s))
        if x is None:
            x = decode_image_compact(self.input_paths[index]).astype(
                np.float32
            ) / 255.0
            x = T.resize_bilinear_np(x, (s, s))
            # byte-bounded: ~4.6MB/entry at 620px; covers TL-pano-scale
            # datasets, silently skips caching once the budget is spent
            if self.cache_images:
                self._cache[("img", index, s)] = x
        mask = None
        if not (self.use_native and ("bits", index, s) in self._cache):
            mask = decode_mask(self.target_paths[index])

        # draw ALL random params up-front in a fixed order so the numpy and
        # native target paths are seed-for-seed identical
        do_blur_jitter = self.augment
        sigma = rng.uniform(0.001, 2.0) if do_blur_jitter else 0.0
        do_hflip = bool(
            self.augment and self.hflip and rng.uniform() > 0.5
        )
        do_vflip = bool(self.augment and self.vflip and rng.uniform() > 0.5)
        aff = T.sample_affine(rng) if (self.augment and self.affine) else None

        # ---- input chain (cv2-native already; resize done at cache fill) ---
        if do_blur_jitter:
            x = x.copy()  # cached base must stay pristine
            x = T.gaussian_blur(x, sigma)
            x = T.color_jitter(x, rng)
        x = T.normalize(x)
        if do_hflip:
            x = T.hflip(x)
        if do_vflip:
            x = x[::-1].copy()
        if aff is not None:
            x = T.affine_nearest(x, aff, fill=-1.0)
        if x.shape[-1] == 1 and not self.emit_gray:
            # grayscale source: broadcast to the reference's 3-channel layout
            # (dataset.py:416-417) after the single-channel chain
            x3 = np.empty(x.shape[:2] + (3,), np.float32)
            x3[..., 0] = x3[..., 1] = x3[..., 2] = x[..., 0]
            x = x3

        # ---- target chain: fused C++ runtime, numpy fallback ---------------
        if self.use_native and not do_vflip:
            from .native import make_target_native

            m = (
                T.affine_forward_matrix(aff, s, s) if aff is not None else None
            )
            y = make_target_native(
                mask, self._target_tables(), s, do_hflip, m,
                bits_cache=self._cache, cache_key=("bits", index, s),
                dtype=self.target_dtype,
            )
            if y is not None:
                return np.asarray(x, np.float32), y

        if mask is None:
            mask = decode_mask(self.target_paths[index])
        y = (
            node_masks(mask, self.tree)
            if self.hierarchical
            else leaf_masks(mask, self.tree)
        ).astype(np.float32)
        y = T.resize_bilinear_np(y, (s, s))
        if do_hflip:
            y = T.hflip(y)
        if do_vflip:
            y = y[::-1].copy()
        if aff is not None:
            chans = []
            for c in range(y.shape[-1]):
                # dataset.py:446-451: channel 0 fills with its max value
                # (out-of-frame stays background), the rest fill -1
                fill = float(y[..., c].max()) if c == 0 else -1.0
                yc = T.affine_nearest(np.ascontiguousarray(y[..., c]), aff, fill)
                chans.append(yc[..., 0] if yc.ndim == 3 else yc)
            y = np.stack(chans, axis=-1)

        y = (y >= 0.5).astype(np.float32)  # dataset.py:454-455
        if self.hierarchical:
            y = ternary_encode(y, self.tree)
        return np.asarray(x, np.float32), np.asarray(y, self.target_dtype)
