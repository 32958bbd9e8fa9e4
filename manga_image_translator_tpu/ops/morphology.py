"""Binary morphology on device.

The reference runs cv2.dilate with elliptical structuring elements per page on
host (mask_refinement/text_mask_utils.py:150-195, manga_translator.py
kernel_size final dilation). Here dilation/erosion are expressed as
reduce_window / convolution, which XLA fuses into the surrounding graph.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def ellipse_kernel(ksize: int) -> np.ndarray:
    """Elliptical structuring element, identical to
    cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))."""
    if ksize <= 1:
        return np.ones((1, 1), dtype=np.float32)
    # cv2's ellipse SE: for each row, the points within the inscribed ellipse.
    r = ksize // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    se = np.zeros((ksize, ksize), dtype=np.float32)
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round((r) * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
        else:
            dx = 0
        j1, j2 = max(0, r - dx), min(ksize, r + dx + 1)
        se[i, j1:j2] = 1.0
    return se


def _binary_dilate_rect(mask: jax.Array, kh: int, kw: int) -> jax.Array:
    """Rectangular dilation via max reduce_window. mask: (..., H, W) float."""
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (mask.ndim - 2) + (kh, kw),
        window_strides=(1,) * mask.ndim,
        padding=[(0, 0)] * (mask.ndim - 2) + [(kh // 2, (kh - 1) // 2),
                                              (kw // 2, (kw - 1) // 2)])


def dilate(mask: jax.Array, ksize: int, shape: str = 'ellipse') -> jax.Array:
    """Binary dilation of (..., H, W) masks with a ksize×ksize element."""
    if ksize <= 1:
        return mask
    m = mask.astype(jnp.float32)
    if shape == 'rect':
        return (_binary_dilate_rect(m, ksize, ksize) > 0).astype(mask.dtype)
    se = jnp.asarray(ellipse_kernel(ksize))
    # dilation with arbitrary SE == conv(mask, SE) > 0
    x = m[..., None]  # (..., H, W, 1)
    batch_shape = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    out = jax.lax.conv_general_dilated(
        x4, se[:, :, None, None],
        window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = (out > 0).astype(mask.dtype).reshape(batch_shape + mask.shape[-2:])
    return out


def erode(mask: jax.Array, ksize: int, shape: str = 'ellipse') -> jax.Array:
    """Binary erosion: complement-dilate-complement."""
    if ksize <= 1:
        return mask
    inv = 1.0 - mask.astype(jnp.float32)
    return (1.0 - dilate(inv, ksize, shape)).astype(mask.dtype)


def open_(mask: jax.Array, ksize: int) -> jax.Array:
    return dilate(erode(mask, ksize), ksize)


def close_(mask: jax.Array, ksize: int) -> jax.Array:
    return erode(dilate(mask, ksize), ksize)


def box_blur(img: jax.Array, ksize: int) -> jax.Array:
    """Mean filter over (..., H, W)."""
    if ksize <= 1:
        return img
    x = img.astype(jnp.float32)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (ksize, ksize),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(ksize // 2, (ksize - 1) // 2)] * 2)
    return s / (ksize * ksize)


@functools.lru_cache(maxsize=64)
def gaussian_kernel_1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(img: jax.Array, sigma: float, radius: int = None) -> jax.Array:
    """Separable gaussian over (..., H, W)."""
    if radius is None:
        radius = max(1, int(round(3 * sigma)))
    k = jnp.asarray(gaussian_kernel_1d(float(sigma), int(radius)))
    x = img.astype(jnp.float32)
    orig_shape = x.shape
    x4 = x.reshape((-1,) + x.shape[-2:])[..., None]  # (B,H,W,1)
    # reflect padding matches cv2.GaussianBlur's default border mode
    x4 = jnp.pad(x4, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                 mode='reflect')
    kv = k[:, None, None, None]
    kh = k[None, :, None, None]
    x4 = jax.lax.conv_general_dilated(
        x4, kv, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x4 = jax.lax.conv_general_dilated(
        x4, kh, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return x4[..., 0].reshape(orig_shape)
