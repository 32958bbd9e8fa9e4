"""Webtoon tiling: split extreme-aspect pages into overlapping square patches.

Behavioral contract from reference ``det_rearrange_forward``
(utils/generic.py:876-997): rearrange triggers when downscale ratio > 2.5 AND
aspect > 3; patches of height ``pw_num*w`` are taken at a uniform stride, laid
side-by-side ``pw_num`` at a time into squares, forwarded, and the probability
maps re-stitched with overlap averaging.

TPU redesign: the plan (offsets, counts) is computed host-side from static
shapes; the patch extraction, batching, and stitch are pure jnp ops with
static slice offsets, so the whole thing lives inside one jit and the network
sees ONE large batch instead of the reference's python loop over batches of 4.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TilePlan:
    transpose: bool          # image was rotated (w > h) before tiling
    pw_num: int              # patches laid side-by-side per square
    patch_h: int             # patch height in source pixels (= pw_num * w)
    offsets: Tuple[int, ...]  # top offset of each patch
    pad_patches: int         # zero patches appended to fill the last square
    src_h: int               # (post-transpose) source height
    src_w: int               # (post-transpose) source width
    num_squares: int

    @property
    def num_patches(self) -> int:
        return len(self.offsets)


def needs_tiling(h: int, w: int, tgt_size: int) -> bool:
    hh, ww = (h, w) if h >= w else (w, h)
    return (hh / tgt_size > 2.5) and (hh / ww > 3)


def plan_tiles(h: int, w: int, tgt_size: int) -> TilePlan:
    transpose = h < w
    if transpose:
        h, w = w, h
    pw_num = max(int(math.floor(2 * tgt_size / w)), 2)
    patch_h = pw_num * w
    ph_num = int(math.ceil(h / patch_h))
    step = int((h - patch_h) / (ph_num - 1)) if ph_num > 1 else 0
    offsets = [min(i * step, max(h - patch_h, 0)) for i in range(ph_num)]
    if ph_num > 1:
        # pin the last tile to the bottom edge so stride rounding never
        # leaves uncovered rows
        offsets[-1] = max(h - patch_h, 0)
    offsets = tuple(offsets)
    num_squares = int(math.ceil(ph_num / pw_num))
    pad_patches = num_squares * pw_num - ph_num
    return TilePlan(transpose, pw_num, patch_h, offsets, pad_patches,
                    h, w, num_squares)


def extract_squares(img: jax.Array, plan: TilePlan) -> jax.Array:
    """(H, W, C) image -> (num_squares, S, S, C) square batch where
    S = patch_h (pw_num patches side by side, zero padded at the tail)."""
    if plan.transpose:
        img = jnp.swapaxes(img, 0, 1)
    h, w, c = img.shape
    if h < plan.patch_h:  # short image: pad to one patch
        img = jnp.pad(img, ((0, plan.patch_h - h), (0, 0), (0, 0)))
    patches = [jax.lax.dynamic_slice_in_dim(img, off, plan.patch_h, axis=0)
               for off in plan.offsets]
    patches += [jnp.zeros_like(patches[0])] * plan.pad_patches
    stack = jnp.stack(patches)  # (P, patch_h, w, C)
    squares = stack.reshape(plan.num_squares, plan.pw_num, plan.patch_h, w, c)
    # place pw_num patches side-by-side: (n, patch_h, pw_num*w, C)
    squares = jnp.concatenate(
        [squares[:, j] for j in range(plan.pw_num)], axis=2)
    return squares


def stitch_maps(maps: jax.Array, plan: TilePlan) -> jax.Array:
    """Inverse of extract_squares for per-pixel maps.

    Args:
      maps: (num_squares, S', S', C) network outputs; S' may be a scaled
        version of the extraction square (the scale is inferred).
    Returns (H', W', C) stitched map over the (post-transpose) source image,
    with overlapping rows averaged by coverage count.
    """
    n, sh, sw, c = maps.shape
    scale = sh / plan.patch_h
    pw = sw // plan.pw_num
    out_h = int(round(plan.src_h * scale))
    out = jnp.zeros((out_h, pw, c), dtype=jnp.float32)
    cnt = jnp.zeros((out_h, 1, 1), dtype=jnp.float32)
    flat = maps.reshape(n, sh, plan.pw_num, pw, c)
    for sq in range(n):
        for j in range(plan.pw_num):
            pidx = sq * plan.pw_num + j
            if pidx >= plan.num_patches:
                break
            top = int(round(plan.offsets[pidx] * scale))
            top = min(top, max(out_h - sh, 0))
            patch = flat[sq, :, j]  # (sh, pw, c)
            ones = jnp.ones((sh, 1, 1), dtype=jnp.float32)
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (top, 0, 0), (sh, pw, c))
                + patch, (top, 0, 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(cnt, (top, 0, 0), (sh, 1, 1))
                + ones, (top, 0, 0))
    out = out / jnp.maximum(cnt, 1.0)
    if plan.transpose:
        out = jnp.swapaxes(out, 0, 1)
    return out
