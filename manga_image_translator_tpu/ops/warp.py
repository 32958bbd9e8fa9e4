"""Batched perspective rectification of textline crops on device.

The reference warps each textline crop on host with cv2.warpPerspective
(utils/generic.py:445-481), one OpenCV call per line. Here the homographies
are computed host-side (4-point DLT, tiny) and the sampling runs as one
batched bilinear gather on device, feeding the OCR model without a host
round-trip.
"""
from __future__ import annotations

import functools
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


# -- OCR crop planning --------------------------------------------------------
#
# Host-side mirrors of Quadrilateral.get_transformed_region
# (utils/geometry.py:292) and TextBlock.get_transformed_region
# (utils/textblock.py:232): same integer quantization, same output
# dimensions, but instead of a cv2 warp they produce an output→source
# homography over FULL-page coordinates. The vertical-text CCW rotation is
# folded into the correspondence order (output always reads left→right at
# ``textheight`` rows), so the device never materializes the unrotated
# intermediate. Semantics note: the reference zero-pads outside the
# *clipped* quad bbox; every source coordinate inside the quad is either
# inside that bbox or outside the image, so zero-padding outside the image
# (bilinear_sample) is equivalent.

_DEGENERATE_H = np.array([[0.0, 0.0, -10.0],
                          [0.0, 0.0, -10.0],
                          [0.0, 0.0, 1.0]])


def _plan_homography(src: np.ndarray, direction: str, w: int,
                     textheight: int) -> np.ndarray:
    """(tl,tr,br,bl) int page coords → output→page H for a (textheight, w)
    left-to-right crop. For vertical lines the CCW rotation of the
    rectified region is folded into the correspondence order: out-corners
    (tl,tr,br,bl) ↦ quad (tr,br,bl,tl)."""
    order = (0, 1, 2, 3) if direction == 'h' else (1, 2, 3, 0)
    return homography_from_quad(src[list(order)].astype(np.float64),
                                w, textheight)


def crop_plan_quad(quad, direction: str, textheight: int
                   ) -> Tuple[int, np.ndarray]:
    """Plan a device crop for a Quadrilateral textline. Returns
    (out_width, H) for an output of (textheight, out_width); H maps output
    coords to page coords (pull warp)."""
    v1, v2 = quad._axes()
    n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
    if n1 <= 1e-6 or n2 <= 1e-6:
        return max(int(textheight), 2), _DEGENERATE_H
    ratio = n1 / n2
    # match geometry.get_transformed_region's max(..., 2) floors
    if direction == 'h':
        w = max(int(round(textheight / ratio)), 2)
    else:
        w = max(int(round(textheight * ratio)), 2)
    quad.assigned_direction = direction
    return w, _plan_homography(quad.pts.astype(np.int64), direction, w,
                               textheight)


def crop_plan_textblock(blk, line_idx: int, textheight: int
                        ) -> Tuple[int, np.ndarray]:
    """Plan a device crop for one line of a TextBlock (direction from
    blk.src_is_vertical, ratio from midpoint norms)."""
    line = np.round(np.array(blk.lines[line_idx])).astype(np.int64)
    direction = 'v' if blk.src_is_vertical else 'h'
    mid = (line[[1, 2, 3, 0]] + line) / 2
    norm_v = np.linalg.norm(mid[2] - mid[0])
    norm_h = np.linalg.norm(mid[1] - mid[3])
    if norm_v <= 0 or norm_h <= 0:
        return max(int(textheight), 2), _DEGENERATE_H
    ratio = norm_v / norm_h
    if direction == 'h':
        w = int(round(textheight / ratio))
    else:
        w = int(round(textheight * ratio))
    w = max(w, 2)
    return w, _plan_homography(line, direction, w, textheight)


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w'))
def crop_batch(img: jax.Array, Hs: jax.Array, valid_w: jax.Array,
               out_h: int, out_w: int) -> jax.Array:
    """N rectified OCR crops in one device program.

    Args:
      img: (H, W, 3) uint8 page (device-resident).
      Hs: (N, 3, 3) output→page homographies.
      valid_w: (N,) int32 — columns ≥ valid_w[i] are padding.
    Returns (N, out_h, out_w, 3) float32, /127.5-1 normalized (padding
    becomes -1.0, matching the host path's zero-pad-then-normalize).
    """
    crops = warp_quads_batch(img, Hs, (out_h, out_w))
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, out_w, 1), 2)
    crops = jnp.where(xs < valid_w[:, None, None, None], crops, 0.0)
    return crops / 127.5 - 1.0


# --------------------------------------------------------------------------
# Separable matmul resampler (round 3)
#
# The batched gather path above costs ~21 ms per 16-crop chunk at bucket
# 1024 on v5e — TPU gathers scalarize. Manga textline quads are almost
# always axis-aligned (minAreaRect of horizontal text; vertical text is
# rotation-folded by the crop plan), and for an axis-aligned homography
# bilinear warping is SEPARABLE: one vertical and one horizontal linear
# resample, each expressible as a small matmul whose triangle weights are
# built from iota arithmetic — zero gathers, MXU-shaped, O(out·src) FLOPs.
# Rotated/perspective quads (rare) keep the gather path.
# --------------------------------------------------------------------------

SEP_SRC_H = 128          # static source-box rows (source text ≤ 128px tall)


def separable_plan(H: np.ndarray, out_h: int, out_w: int, src_h: int,
                   src_w: int):
    """Per-crop plan for the separable resampler, or None if the quad is
    not axis-aligned / does not fit the static source box.

    Returns ((y0, x0), (yb, yk), (xb, xk)): source-box origin in page
    coords and box-relative sample coords sy(r) = yb + yk*r,
    sx(o) = xb + xk*o.
    """
    H = np.asarray(H, np.float64)
    if abs(H[2, 2]) < 1e-12:
        return None
    H = H / H[2, 2]
    scale = max(abs(H[0, 0]), abs(H[1, 1]), 1.0)
    if max(abs(H[0, 1]), abs(H[1, 0])) > 1e-6 * scale \
            or max(abs(H[2, 0]), abs(H[2, 1])) > 1e-9:
        return None
    a, c = H[0, 0], H[0, 2]
    e, f = H[1, 1], H[1, 2]
    ys = (f, f + e * (out_h - 1))
    xs = (c, c + a * (out_w - 1))
    y0 = int(np.floor(min(ys))) - 1
    x0 = int(np.floor(min(xs))) - 1
    if int(np.ceil(max(ys))) + 2 - y0 > src_h:
        return None
    if int(np.ceil(max(xs))) + 2 - x0 > src_w:
        return None
    return (y0, x0), (f - y0, e), (c - x0, a)


@functools.partial(jax.jit,
                   static_argnames=('out_h', 'out_w', 'src_h', 'src_w'))
def crop_batch_separable(img: jax.Array, origins: jax.Array,
                         ycoef: jax.Array, xcoef: jax.Array,
                         valid_w: jax.Array, out_h: int, out_w: int,
                         src_h: int, src_w: int) -> jax.Array:
    """N axis-aligned rectified crops as two matmuls per crop.

    Args:
      img: (H, W, 3) uint8 page.
      origins: (N, 2) int32 source-box (y0, x0) in page coords (may hang
        off the page; the page is zero-padded so out-of-image samples are
        0, matching bilinear_sample).
      ycoef/xcoef: (N, 2) f32 [b, k] — box-relative sy(r)=b+k*r,
        sx(o)=b+k*o.
      valid_w: (N,) int32 output-column validity.
    Returns (N, out_h, out_w, 3) float32 normalized like crop_batch.
    """
    padded = jnp.pad(img, ((src_h, src_h), (src_w, src_w), (0, 0)))

    def one(origin, yc, xc):
        box = jax.lax.dynamic_slice(
            padded, (origin[0] + src_h, origin[1] + src_w, 0),
            (src_h, src_w, 3)).astype(jnp.float32)
        r = jnp.arange(out_h, dtype=jnp.float32)
        sy = yc[0] + yc[1] * r
        hh = jnp.arange(src_h, dtype=jnp.float32)
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, None] - hh[None, :]))
        o = jnp.arange(out_w, dtype=jnp.float32)
        sx = xc[0] + xc[1] * o
        xx = jnp.arange(src_w, dtype=jnp.float32)
        wh = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None] - xx[None, :]))
        tmp = jnp.einsum('rh,hxc->rxc', wv, box,
                         preferred_element_type=jnp.float32)
        return jnp.einsum('ox,rxc->roc', wh, tmp,
                          preferred_element_type=jnp.float32)

    crops = jax.vmap(one)(origins, ycoef, xcoef)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, out_w, 1), 2)
    crops = jnp.where(xs < valid_w[:, None, None, None], crops, 0.0)
    return crops / 127.5 - 1.0


@functools.partial(jax.jit,
                   static_argnames=('out_h', 'out_w', 'src_h', 'src_w'))
def crop_batch_separable_patched(img: jax.Array, origins: jax.Array,
                                 ycoef: jax.Array, xcoef: jax.Array,
                                 valid_w: jax.Array, patch_rows: jax.Array,
                                 patch_vals: jax.Array, out_h: int,
                                 out_w: int, src_h: int, src_w: int
                                 ) -> jax.Array:
    """Separable crop batch with a few HOST-warped rows patched in.

    Mixed per-quad routing: in a chunk where most quads are axis-aligned
    (separable matmul path, ≲3 ms on device) but a few are rotated, the
    rotated ones are cv2-warped on host (cheap at that count) and written
    over their rows here instead of dragging the whole chunk back to host
    (or through the ~21 ms/chunk device gather path).

    Args:
      patch_rows: (M,) int32 row indices to overwrite (duplicates allowed —
        callers pad to a bucket size by repeating the last row).
      patch_vals: (M, out_h, out_w, 3) float32 crops already normalized
        like crop_batch output (/127.5-1, padding -1).
    """
    crops = crop_batch_separable(img, origins, ycoef, xcoef, valid_w,
                                 out_h=out_h, out_w=out_w, src_h=src_h,
                                 src_w=src_w)
    return crops.at[patch_rows].set(patch_vals)


_ZERO_PLAN = ((0, 0), (0.0, 0.0), (0.0, 0.0))


def crop_chunk_mixed(img: jax.Array, plans, indices, host_regions: dict,
                     valid_w: np.ndarray, out_h: int, out_w: int,
                     chunk_size: int) -> jax.Array:
    """One (chunk_size, out_h, out_w, 3) normalized crop batch with
    per-quad routing: axis-aligned quads through the separable matmul
    resampler, the (rare) rotated/perspective quads cv2-warped on host by
    the caller (``host_regions[idx]`` uint8 crops) and patched over their
    rows. Falls back to the whole-chunk gather path only if a quad that
    probed separable at its own width fails at the bucket width (cannot
    happen for out_w ≥ own width; kept as a guard).
    """
    src_w = 2 * out_w
    sep_plans = []
    patch_rows: list = []
    patch_vals: list = []
    for row, i in enumerate(indices):
        if i in host_regions:
            reg = host_regions[i]
            buf = np.zeros((out_h, out_w, 3), np.float32)
            w = min(reg.shape[1], out_w)
            buf[:, :w] = reg[:, :w]
            patch_rows.append(row)
            patch_vals.append(buf / 127.5 - 1.0)
            sep_plans.append(_ZERO_PLAN)
        else:
            p = separable_plan(plans[i][1], out_h, out_w, SEP_SRC_H, src_w)
            if p is None:
                Hs = np.stack([plans[j][1] for j in indices]
                              + [_DEGENERATE_H] * (chunk_size - len(indices)))
                return crop_batch(img, jnp.asarray(Hs), jnp.asarray(valid_w),
                                  out_h=out_h, out_w=out_w)
            sep_plans.append(p)
    sep_plans += [_ZERO_PLAN] * (chunk_size - len(indices))
    origins = jnp.asarray([p[0] for p in sep_plans], jnp.int32)
    ycoef = jnp.asarray([p[1] for p in sep_plans], jnp.float32)
    xcoef = jnp.asarray([p[2] for p in sep_plans], jnp.float32)
    vw = jnp.asarray(valid_w)
    if not patch_rows:
        return crop_batch_separable(img, origins, ycoef, xcoef, vw,
                                    out_h=out_h, out_w=out_w,
                                    src_h=SEP_SRC_H, src_w=src_w)
    # pad the patch list to a power-of-two bucket (duplicate writes of the
    # same row/value are idempotent) so patch counts don't proliferate
    # compiled shapes
    m = 1
    while m < len(patch_rows):
        m *= 2
    while len(patch_rows) < m:
        patch_rows.append(patch_rows[-1])
        patch_vals.append(patch_vals[-1])
    return crop_batch_separable_patched(
        img, origins, ycoef, xcoef, vw,
        jnp.asarray(patch_rows, jnp.int32),
        jnp.asarray(np.stack(patch_vals), jnp.float32),
        out_h=out_h, out_w=out_w, src_h=SEP_SRC_H, src_w=src_w)


def crop_batch_auto(img: jax.Array, Hs: np.ndarray, valid_w: np.ndarray,
                    out_h: int, out_w: int) -> jax.Array:
    """Route a crop chunk to the separable matmul path when EVERY quad is
    axis-aligned and fits the static source box, else the gather path."""
    src_w = 2 * out_w
    plans = [separable_plan(H, out_h, out_w, SEP_SRC_H, src_w)
             for H in np.asarray(Hs)]
    if all(p is not None for p in plans):
        origins = jnp.asarray([p[0] for p in plans], jnp.int32)
        ycoef = jnp.asarray([p[1] for p in plans], jnp.float32)
        xcoef = jnp.asarray([p[2] for p in plans], jnp.float32)
        return crop_batch_separable(img, origins, ycoef, xcoef,
                                    jnp.asarray(valid_w), out_h, out_w,
                                    SEP_SRC_H, src_w)
    return crop_batch(img, jnp.asarray(Hs), jnp.asarray(valid_w),
                      out_h=out_h, out_w=out_w)
