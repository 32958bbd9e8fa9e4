"""Batched perspective rectification of textline crops on device.

The reference warps each textline crop on host with cv2.warpPerspective
(utils/generic.py:445-481), one OpenCV call per line. Here the homographies
are computed host-side (4-point DLT, tiny) and the sampling runs as one
batched bilinear gather on device, feeding the OCR model without a host
round-trip.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def homography_from_quad(src_pts: np.ndarray, w: int, h: int) -> np.ndarray:
    """Homography mapping the output (w×h) rect back onto ``src_pts``
    (tl, tr, br, bl) — i.e. the *inverse* map used for sampling."""
    dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                   dtype=np.float64)
    src = np.asarray(src_pts, dtype=np.float64)
    # Solve DLT for H: src = H @ dst (so sampling pulls from src coords).
    A = []
    for (xd, yd), (xs, ys) in zip(dst, src):
        A.append([xd, yd, 1, 0, 0, 0, -xs * xd, -xs * yd, -xs])
        A.append([0, 0, 0, xd, yd, 1, -ys * xd, -ys * yd, -ys])
    A = np.asarray(A)
    _, _, vt = np.linalg.svd(A)
    H = vt[-1].reshape(3, 3)
    return H / H[2, 2]


def bilinear_sample(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Sample (H, W, C) image at float coords; zero padding outside."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = xs - x0
    wy = ys - y0

    imgf = img.astype(jnp.float32)

    def getf(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        vals = imgf[yy, xx]
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = getf(y0, x0)
    v01 = getf(y0, x1)
    v10 = getf(y1, x0)
    v11 = getf(y1, x1)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    return ((v00 * (1 - wx_) + v01 * wx_) * (1 - wy_)
            + (v10 * (1 - wx_) + v11 * wx_) * wy_)


def warp_perspective(img: jax.Array, H: jax.Array, out_hw: Tuple[int, int]
                     ) -> jax.Array:
    """Pull-warp ``img`` (H, W, C) through homography ``H`` (maps output
    coords -> source coords) to an (out_h, out_w, C) crop."""
    oh, ow = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    H = H.astype(jnp.float32)
    # elementwise projective transform — keeps full fp32 on TPU (a matmul
    # here would route through the MXU at reduced precision)
    den = H[2, 0] * xs + H[2, 1] * ys + H[2, 2]
    sx = (H[0, 0] * xs + H[0, 1] * ys + H[0, 2]) / den
    sy = (H[1, 0] * xs + H[1, 1] * ys + H[1, 2]) / den
    return bilinear_sample(img, sx, sy)


def warp_quads_batch(img: jax.Array, Hs: jax.Array, out_hw: Tuple[int, int]
                     ) -> jax.Array:
    """Extract N rectified crops of identical (out_h, out_w) in one shot.

    Args:
      img: (H, W, C) page.
      Hs: (N, 3, 3) output->source homographies (host-computed).
    Returns (N, out_h, out_w, C) crops.
    """
    return jax.vmap(lambda H: warp_perspective(img, H, out_hw))(Hs)
