"""Device-side image plumbing: resize / pad / normalize.

Replaces the reference's per-stage host OpenCV work (resize_keep_aspect,
square_pad_resize — utils/generic.py:849-874, det_rearrange preprocessing)
with jittable JAX ops so a page stays in HBM across stages.

Layout convention: NHWC everywhere (TPU-native; C maps to lanes).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int],
                    antialias: bool = False) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) images; matches cv2 INTER_LINEAR
    semantics (half-pixel centers, no antialias) when ``antialias=False``."""
    if img.ndim == 3:
        h, w = out_hw
        return jax.image.resize(img, (h, w, img.shape[-1]), method='linear',
                                antialias=antialias)
    n, _, _, c = img.shape
    h, w = out_hw
    return jax.image.resize(img, (n, h, w, c), method='linear',
                            antialias=antialias)


def resize_area(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Downscale with box filtering (cv2 INTER_AREA analogue)."""
    if img.ndim == 3:
        h, w = out_hw
        return jax.image.resize(img, (h, w, img.shape[-1]), method='linear',
                                antialias=True)
    n, _, _, c = img.shape
    h, w = out_hw
    return jax.image.resize(img, (n, h, w, c), method='linear', antialias=True)


def pad_to_multiple(img: jax.Array, multiple: int,
                    value: float = 0.0) -> Tuple[jax.Array, Tuple[int, int]]:
    """Bottom/right pad H and W up to the next multiple. Static shapes only."""
    if img.ndim == 3:
        h, w = img.shape[:2]
        ph = (-h) % multiple
        pw = (-w) % multiple
        out = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=value)
        return out, (ph, pw)
    h, w = img.shape[1:3]
    ph = (-h) % multiple
    pw = (-w) % multiple
    out = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                  constant_values=value)
    return out, (ph, pw)


def letterbox(img: jax.Array, size: int,
              pad_value: float = 0.0) -> Tuple[jax.Array, float, Tuple[int, int]]:
    """Resize the longer side to ``size`` keeping aspect, then pad bottom/right
    to a ``size``×``size`` square. Host-static shapes (python ints).

    Returns (square image, scale ratio, (resized_h, resized_w)).
    """
    h, w = (img.shape[0], img.shape[1]) if img.ndim == 3 else (img.shape[1], img.shape[2])
    ratio = size / max(h, w)
    nh, nw = int(round(h * ratio)), int(round(w * ratio))
    resized = resize_bilinear(img, (nh, nw))
    if img.ndim == 3:
        out = jnp.pad(resized, ((0, size - nh), (0, size - nw), (0, 0)),
                      constant_values=pad_value)
    else:
        out = jnp.pad(resized, ((0, 0), (0, size - nh), (0, size - nw), (0, 0)),
                      constant_values=pad_value)
    return out, ratio, (nh, nw)


# ImageNet statistics used by several detector backbones.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_imagenet(img: jax.Array) -> jax.Array:
    """uint8/float RGB -> imagenet-normalized float32."""
    x = img.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def to_unit(img: jax.Array) -> jax.Array:
    return img.astype(jnp.float32) / 255.0


def from_unit(img: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma, matching cv2.cvtColor(..., COLOR_RGB2GRAY)."""
    coeffs = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.tensordot(img.astype(jnp.float32), coeffs, axes=[[-1], [0]])


def gamma_correct(img: jax.Array) -> jax.Array:
    """Mid-gray auto gamma (reference detection/common.py pre-filter)."""
    x = to_unit(img)
    mid = jnp.array(0.5, jnp.float32)
    mean = jnp.mean(rgb_to_gray(img)) / 255.0
    gamma = jnp.log(mid) / jnp.log(jnp.maximum(mean, 1e-6))
    return from_unit(jnp.power(x, gamma))


@functools.partial(jax.jit, static_argnames=('canonical_sizes',))
def _noop(x, canonical_sizes=()):
    return x


def pick_canonical_size(h: int, w: int,
                        sizes: Tuple[int, ...] = (1024, 1536, 2048)) -> int:
    """Choose the smallest canonical square that fits the detection-resized
    image, bounding the number of distinct compiled shapes."""
    longest = max(h, w)
    for s in sizes:
        if longest <= s:
            return s
    return sizes[-1]
