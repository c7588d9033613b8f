"""Host-side image/target transforms reproducing the reference's torchvision
pipeline (Data/dataloaders.py:49-69, Data/dataset.py:423-455) in numpy + cv2.

Train-input chain:  scale to [0,1] -> resize (bilinear, no antialias) ->
GaussianBlur(k=25, sigma~U[0.001,2]) -> ColorJitter(0.4,0.5,0.25,0.01) ->
Normalize(0.5,0.5).  Eval-input chain drops blur/jitter. Targets: per-channel
resize -> threshold 0.5. Paired augs: hflip(p=0.5) and a shared random affine
(angle ±50°, translate ±20px, scale [0.85,1.15], shear ±5°, NEAREST
interpolation — torchvision ``TF.affine``'s default) with the reference's fill
conventions: image -1.0, first target channel filled with its max (background
stays background out-of-frame), other channels -1 (then squashed to 0 by the
0.5 re-binarization, dataset.py:454-455).

Pixel conventions verified against torch/torchvision oracles where available;
ColorJitter and affine use torchvision's documented math (random order of the
four jitter ops; inverse affine matrix about the image center).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np

__all__ = [
    "resize_bilinear_np",
    "gaussian_blur",
    "color_jitter",
    "normalize",
    "hflip",
    "AffineParams",
    "sample_affine",
    "affine_nearest",
]


def resize_bilinear_np(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Half-pixel bilinear resize (== torch interpolate antialias=False)."""
    if img.shape[:2] == tuple(size):
        return img
    out = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_LINEAR)
    if img.ndim == 3 and out.ndim == 2:
        out = out[..., None]
    return out


def gaussian_blur(img: np.ndarray, sigma: float, ksize: int = 25) -> np.ndarray:
    """GaussianBlur((25,25), sigma) — dataloaders.py:53.

    (S, S, 1) arrays are squeezed to 2-D first: cv2 takes a ~10x slower
    generic path for 3-D single-channel inputs."""
    one = img.ndim == 3 and img.shape[2] == 1
    src = img[..., 0] if one else img
    out = cv2.GaussianBlur(src, (ksize, ksize), sigmaX=sigma, sigmaY=sigma,
                           borderType=cv2.BORDER_REFLECT101)
    return out[..., None] if one else out


def _blend(a: np.ndarray, b, factor: float) -> np.ndarray:
    if isinstance(b, np.ndarray) and b.shape == a.shape:
        out = cv2.addWeighted(a, factor, b, 1.0 - factor, 0.0)  # SIMD path
    else:
        out = np.multiply(a, factor, dtype=np.float32)
        if b:  # scalar blend target (0.0 for brightness, mean for contrast)
            out += (1.0 - factor) * b
    return np.clip(out, 0.0, 1.0, out=out).astype(np.float32, copy=False)


def _grayscale(img: np.ndarray) -> np.ndarray:
    # ITU-R 601 luma (cv2 and torchvision rgb_to_grayscale share the weights)
    return cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]


def _adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)  # H in [0,360) for float32
    hsv[..., 0] = (hsv[..., 0] + factor * 360.0) % 360.0
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def color_jitter(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.4,
    contrast: float = 0.5,
    saturation: float = 0.25,
    hue: float = 0.01,
) -> np.ndarray:
    """torchvision ColorJitter(0.4, 0.5, 0.25, 0.01) — dataloaders.py:54.

    Factors sampled U[max(0,1-x), 1+x] (hue: U[-h,h]); the four ops are applied
    in a random permutation, as torchvision does.

    Grayscale fast path: for a single-channel image (the radiograph case —
    the reference stacks gray->3ch *before* jitter, dataset.py:416-417),
    saturation is ``blend(img, grayscale(img)==img) == img`` and hue rotation
    of an R==G==B pixel is the identity (S==0), so both are exact no-ops;
    grayscale(img) is the channel itself. Same math on 1/3 the bytes — the
    RNG draw order is unchanged, so sequences are seed-for-seed identical
    with the 3-channel path.
    """
    fb = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    fc = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    fs = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    fh = rng.uniform(-hue, hue)
    order = rng.permutation(4)
    gray = img.ndim == 2 or img.shape[-1] == 1
    for op in order:
        if op == 0:
            img = _blend(img, 0.0, fb)
        elif op == 1:
            g = img if gray else _grayscale(img)
            img = _blend(img, float(g.mean()), fc)
        elif op == 2 and not gray:
            img = _blend(img, np.repeat(_grayscale(img), 3, axis=-1), fs)
        elif op == 3 and not gray:
            img = np.clip(_adjust_hue(img, fh), 0.0, 1.0)
    return img.astype(np.float32, copy=False)


def normalize(img: np.ndarray, mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    return ((img - mean) / std).astype(np.float32)


def hflip(img: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(img[:, ::-1])


class AffineParams:
    __slots__ = ("angle", "translate", "scale", "shear")

    def __init__(self, angle, translate, scale, shear):
        self.angle = angle
        self.translate = translate
        self.scale = scale
        self.shear = shear


def sample_affine(rng: np.random.Generator) -> AffineParams:
    """Reference parameter ranges — dataset.py:438-442."""
    return AffineParams(
        angle=rng.uniform(-50.0, 50.0),
        translate=(rng.uniform(-20, 20), rng.uniform(-20, 20)),
        scale=rng.uniform(0.85, 1.15),
        shear=rng.uniform(-5, 5),
    )


def _torchvision_affine_matrix(params: AffineParams, h: int, w: int) -> np.ndarray:
    """Forward affine matrix matching torchvision ``TF.affine`` semantics:
    output = T(translate) @ C @ R(angle) @ Shear @ Scale @ C^-1 applied about
    the image center C = ((w-1)/2 + 0.5 ... torchvision uses (w*0.5, h*0.5))."""
    cx, cy = w * 0.5, h * 0.5
    rot = math.radians(params.angle)
    sx = math.radians(params.shear)
    sy = 0.0
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    s = params.scale
    tx, ty = params.translate
    # forward: p_out = M @ (p_in - center) * ... torchvision defines the
    # INVERSE matrix for grid sampling; build forward then invert with cv2.
    m = np.array([[s * a, s * b, 0.0], [s * c, s * d, 0.0], [0, 0, 1]])
    pre = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1]], np.float64)
    post = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
    return (pre @ m @ post)[:2]


def affine_forward_matrix(params: AffineParams, h: int, w: int) -> np.ndarray:
    """Expose the forward 2x3 matrix (for the native C++ sample factory)."""
    return _torchvision_affine_matrix(params, h, w)


def affine_nearest(
    img: np.ndarray, params: AffineParams, fill: float
) -> np.ndarray:
    """Apply the shared paired affine with NEAREST interpolation (torchvision
    ``TF.affine`` default) and a constant fill — dataset.py:443-451."""
    h, w = img.shape[:2]
    m = _torchvision_affine_matrix(params, h, w)
    one = img.ndim == 3 and img.shape[2] == 1
    src = img[..., 0] if one else img
    border = (float(fill),) * (src.shape[2] if src.ndim == 3 else 1)
    out = cv2.warpAffine(
        np.ascontiguousarray(src), m, (w, h), flags=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT, borderValue=border,
    )
    if img.ndim == 3 and out.ndim == 2:
        out = out[..., None]
    return out
