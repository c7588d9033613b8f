"""On-device augmentation over a device-resident training set.

The reference's input pipeline re-decodes, re-augments, and re-encodes every
sample on the host every epoch (dataset.py:397-476) — on a weak host that
starves the chip (BENCHMARKS.md: one CPU core feeds ~37 img/s against a chip
consuming 24-36). TL-pano-scale datasets are tiny on an accelerator's HBM
(194 images x ~2.3 MB base data at 620px), so this module flips the design:
the host uploads the *augmentation-independent* base data ONCE — resized
[0,1] grayscale images and resized binarized node masks — and every epoch's
randomness (blur, jitter, flip, affine, ternary re-encode) runs as one jitted
batched program on device. Epoch time becomes pure device time; host work per
epoch is an integer permutation.

Semantics mirror the host pipeline (data/transforms.py, reference
dataloaders.py:49-57 + dataset.py:423-464) distributionally: identical
parameter ranges, gaussian-blur/jitter/affine math, fill conventions
(image -1; target channel 0 fills with its max, others with -1 -> 0 after
re-binarization), and the same augment-then-ternary ordering. Pixel-exact
equality with cv2 is not guaranteed (rounding at affine boundaries); a
fixed-parameter equivalence test bounds the deviation
(tests/test_device_augment.py). Off by default (``--device-data True``) —
the host path remains the bit-parity reference.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from ..hierarchy.tree import ClassTree

__all__ = [
    "AugmentParams",
    "DeviceDataset",
    "load_base_arrays",
    "make_augment_fn",
    "sample_params",
    "ternary_encode_jax",
]

_KSIZE = 25  # GaussianBlur kernel (dataloaders.py:53)


class AugmentParams(NamedTuple):
    """Per-sample augmentation draw (all scalars, jit-traceable)."""

    sigma: object       # blur sigma ~ U[0.001, 2]
    brightness: object  # ~ U[0.6, 1.4]
    contrast: object    # ~ U[0.5, 1.5]
    bc_order: object    # 0: brightness then contrast, 1: reverse
    do_hflip: object    # bool
    angle: object       # degrees ~ U[-50, 50]
    tx: object          # pixels ~ U[-20, 20]
    ty: object
    scale: object       # ~ U[0.85, 1.15]
    shear: object       # degrees ~ U[-5, 5]


def sample_params(key) -> AugmentParams:
    """Reference parameter ranges (dataloaders.py:53-54, dataset.py:438-442).
    torchvision jitters in a random 4-op order; on grayscale only
    brightness/contrast act, so only their relative order matters."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 10)
    u = lambda k, lo, hi: jax.random.uniform(  # noqa: E731
        k, (), jnp.float32, lo, hi)
    return AugmentParams(
        sigma=u(ks[0], 0.001, 2.0),
        brightness=u(ks[1], 0.6, 1.4),
        contrast=u(ks[2], 0.5, 1.5),
        bc_order=jax.random.bernoulli(ks[3]),
        do_hflip=jax.random.bernoulli(ks[4]),
        angle=u(ks[5], -50.0, 50.0),
        tx=u(ks[6], -20.0, 20.0),
        ty=u(ks[7], -20.0, 20.0),
        scale=u(ks[8], 0.85, 1.15),
        shear=u(ks[9], -5.0, 5.0),
    )


def _gaussian_blur(img, sigma):
    """Separable 25-tap blur, REFLECT101 padding (== np 'reflect'), per-sample
    sigma -> the kernel is computed on device (cv2.getGaussianKernel formula).
    img: (S, S, 1)."""
    import jax.numpy as jnp
    from jax import lax

    r = _KSIZE // 2
    i = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(i * i) / (2.0 * sigma * sigma))
    k = k / k.sum()
    dn = ("NHWC", "HWIO", "NHWC")
    x = img[None]                                         # (1, S, S, 1)
    x = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        x, k.reshape(_KSIZE, 1, 1, 1), (1, 1), "VALID", dimension_numbers=dn)
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        x, k.reshape(1, _KSIZE, 1, 1), (1, 1), "VALID", dimension_numbers=dn)
    return x[0]


def _jitter_gray(img, p: AugmentParams):
    """Brightness/contrast in random order; saturation/hue are exact no-ops
    on R==G==B inputs (transforms.py color_jitter grayscale fast path)."""
    import jax.numpy as jnp

    def bright(x):
        return jnp.clip(x * p.brightness, 0.0, 1.0)

    def contrast(x):
        m = x.mean()
        return jnp.clip(m + (x - m) * p.contrast, 0.0, 1.0)

    a = contrast(bright(img))
    b = bright(contrast(img))
    return jnp.where(p.bc_order, b, a)


def _affine_inverse_matrix(p: AugmentParams, h: int, w: int):
    """Inverse (dst->src) 3x3 matrix of the torchvision-convention forward
    affine about the image center (transforms.py:_torchvision_affine_matrix),
    built on device from traced params."""
    import jax.numpy as jnp

    rot = p.angle * (jnp.pi / 180.0)
    sx = p.shear * (jnp.pi / 180.0)
    a = jnp.cos(rot)
    b = -jnp.cos(rot) * jnp.tan(sx) - jnp.sin(rot)
    c = jnp.sin(rot)
    d = -jnp.sin(rot) * jnp.tan(sx) + jnp.cos(rot)
    s = p.scale
    cx, cy = w * 0.5, h * 0.5
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    m = m.at[0, 0].set(s * a).at[0, 1].set(s * b)
    m = m.at[1, 0].set(s * c).at[1, 1].set(s * d)
    pre = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    pre = pre.at[0, 2].set(cx + p.tx).at[1, 2].set(cy + p.ty)
    post = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    post = post.at[0, 2].set(-cx).at[1, 2].set(-cy)
    return jnp.linalg.inv(pre @ m @ post)


def _affine_nearest(x, minv, fill):
    """NEAREST warp of (S, S, C) by the inverse matrix; out-of-frame -> fill
    (scalar or per-channel (C,))."""
    import jax.numpy as jnp

    h, w = x.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sxf = minv[0, 0] * xx + minv[0, 1] * yy + minv[0, 2]
    syf = minv[1, 0] * xx + minv[1, 1] * yy + minv[1, 2]
    sxi = jnp.floor(sxf + 0.5).astype(jnp.int32)
    syi = jnp.floor(syf + 0.5).astype(jnp.int32)
    valid = (sxi >= 0) & (sxi < w) & (syi >= 0) & (syi < h)
    sxi = jnp.clip(sxi, 0, w - 1)
    syi = jnp.clip(syi, 0, h - 1)
    warped = x[syi, sxi]                       # (S, S, C) gather
    fill = jnp.broadcast_to(jnp.asarray(fill, x.dtype), (x.shape[-1],))
    return jnp.where(valid[..., None], warped, fill)


def ternary_encode_jax(binary, tree: ClassTree):
    """jnp port of target_factory.ternary_encode: child channel c with parent
    p -> 1 where c, 0 where p and not c, -1 outside p (dataset.py:227-265)."""
    import jax.numpy as jnp

    out = [binary[..., a:b] for (a, b) in tree.level_slices[:1]]
    for L in range(1, tree.num_levels):
        a, b = tree.level_slices[L]
        pa, pb = tree.level_slices[L - 1]
        parents = binary[..., pa:pb][..., tuple(tree.parent_index[L])]
        child = binary[..., a:b]
        out.append(jnp.where(child > 0, 1.0,
                             jnp.where(parents > 0, 0.0, -1.0)))
    return jnp.concatenate(out, axis=-1)


def augment_sample(img01, y01, p: AugmentParams, tree: ClassTree,
                   hierarchical: bool):
    """One sample's full train-time chain on device.

    img01: (S, S, 1) float32 in [0, 1] (resized base).
    y01:   (S, S, C) {0,1} (resized, binarized node/leaf masks).
    Returns (image (S,S,1) normalized/augmented, target (S,S,C) ternary)."""
    import jax.numpy as jnp

    x = _gaussian_blur(img01, p.sigma)
    x = _jitter_gray(x, p)
    x = (x - 0.5) / 0.5
    y = y01.astype(jnp.float32)
    x = jnp.where(p.do_hflip, x[:, ::-1], x)
    y = jnp.where(p.do_hflip, y[:, ::-1], y)
    minv = _affine_inverse_matrix(p, *x.shape[:2])
    x = _affine_nearest(x, minv, -1.0)
    # fill rules (dataset.py:446-451): channel 0 fills with its own max
    # (out-of-frame stays background), others with -1 -> 0 after the >=0.5
    # re-binarization
    c0_fill = y[..., 0].max()
    fills = jnp.concatenate(
        [c0_fill[None], jnp.full((y.shape[-1] - 1,), -1.0)])
    y = _affine_nearest(y, minv, fills)
    y = (y >= 0.5).astype(jnp.float32)
    if hierarchical:
        y = ternary_encode_jax(y, tree)
    return x, y


def make_augment_fn(tree: ClassTree, hierarchical: bool):
    """jit-able ``(key, images01, masks01) -> (x, y)`` batched augmentation:
    one PRNG subkey per sample, vmapped chain."""
    import jax

    def fn(key, images01, masks01):
        keys = jax.random.split(key, images01.shape[0])
        return jax.vmap(
            lambda k, im, ms: augment_sample(
                im, ms, sample_params(k), tree, hierarchical)
        )(keys, images01, masks01)

    return jax.jit(fn)


def load_base_arrays(input_paths: List[str], target_paths: List[str],
                     tree: ClassTree, img_size: int, hierarchical: bool
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side one-time load of the augmentation-independent base data:
    resized [0,1] grayscale images (N,S,S,1) f32 and resized binarized
    node/leaf masks (N,S,S,C) uint8."""
    from . import transforms as T
    from .dataset import decode_image_compact, decode_mask
    from .target_factory import leaf_masks, node_masks

    s = int(img_size)
    xs, ys = [], []
    for ip, tp in zip(input_paths, target_paths):
        x = decode_image_compact(ip).astype(np.float32) / 255.0
        if x.ndim != 3 or x.shape[-1] != 1:
            # the device chain implements the grayscale fast path only
            # (radiographs; saturation/hue are exact no-ops there) — color
            # sources must use the host pipeline, which jitters all 4 ops
            raise ValueError(
                f"--device-data supports grayscale sources only; {ip} "
                f"decodes to shape {x.shape}. Use the host pipeline "
                "(device_data=False) for color datasets."
            )
        xs.append(T.resize_bilinear_np(x, (s, s)))
        mask = decode_mask(tp)
        y = (node_masks(mask, tree) if hierarchical
             else leaf_masks(mask, tree)).astype(np.float32)
        y = T.resize_bilinear_np(y, (s, s))
        ys.append((y >= 0.5).astype(np.uint8))
    return np.stack(xs), np.stack(ys)


class DeviceDataset:
    """Device-resident train set + per-epoch batch iterator.

    Upload once; per epoch the host contributes only a shuffled permutation.
    Each iterated item is ``(x, y)`` ALREADY on device, augmented by one
    jitted program (gather + blur + jitter + flip + affine + ternary).

    Placement: without an explicit ``sharding`` (or ``set_sharding``) the
    base arrays and augmentation run on the default device; the consumer's
    ``prefetch_to_device`` re-lays batches out for the training mesh.
    Fold-parallel one-device-per-fold meshes call ``place`` so each fold's
    dataset + augmentation lives on its own device and global batches
    assemble from the per-device shards
    (``FoldParallelTrainer._from_shards``); other multi-device fold meshes
    (data axis > 1) still funnel augmentation through the default device."""

    def __init__(self, input_paths, target_paths, tree: ClassTree,
                 img_size: int, hierarchical: bool, batch_size: int,
                 seed: int = 0, sharding=None, device=None):
        import jax

        images, masks = load_base_arrays(
            input_paths, target_paths, tree, img_size, hierarchical)
        # upload straight to the target device when given (fold-parallel
        # passes each fold's device — avoids a transient all-folds pileup on
        # the default device followed by device-to-device moves)
        self._images = jax.device_put(images, device)
        self._masks = jax.device_put(masks, device)
        self.device = device
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self._n = images.shape[0]
        self._sharding = sharding
        aug = make_augment_fn(tree, hierarchical)

        def gather_augment(key, idx, images01, masks01):
            return aug(key, images01[idx], masks01[idx].astype("float32"))

        self._fn = jax.jit(gather_augment)
        self._epoch = 0

    def __len__(self):
        return self._n // self.batch_size  # drop_last, loader.py parity

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def set_sharding(self, sharding):
        """Lay augmented batches out for the training mesh at the source
        (otherwise the consumer's prefetch re-puts them)."""
        self._sharding = sharding

    def place(self, device):
        """Commit the base arrays (and thus the augmentation compute) to one
        specific device — fold-parallel places each fold's dataset on its
        fold group's device so augmentation runs fold-parallel too."""
        import jax

        self._images = jax.device_put(self._images, device)
        self._masks = jax.device_put(self._masks, device)
        self.device = device

    def __iter__(self):
        import jax

        rng = np.random.default_rng(self.seed + self._epoch)
        perm = rng.permutation(self._n)
        base = jax.random.PRNGKey(self.seed)
        key = jax.random.fold_in(base, self._epoch)
        for b in range(len(self)):
            idx = np.asarray(perm[b * self.batch_size:(b + 1) * self.batch_size])
            x, y = self._fn(jax.random.fold_in(key, b), idx,
                            self._images, self._masks)
            if self._sharding is not None:
                x = jax.device_put(x, self._sharding)
                y = jax.device_put(y, self._sharding)
            yield x, y
