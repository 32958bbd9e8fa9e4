"""Dense-CRF mean-field refinement as a jittable JAX op.

Replaces the pydensecrf (C++/Cython) per-textline call in the reference
(mask_refinement/text_mask_utils.py:68-94: 2 classes, pairwiseGaussian sxy=1
compat=3, pairwiseBilateral sxy=23 srgb=7 compat=20, 5 iterations).

pydensecrf evaluates *dense* pairwise potentials via a permutohedral lattice;
text-mask refinement only needs local context, so the message passing here is
windowed: the gaussian term is a separable convolution and the bilateral term
is evaluated exactly within a (2R+1)² window. With sxy=23, R=31 covers ±1.35σ
of the kernel mass around each pixel — ample for glyph-boundary snapping, and
it maps onto the VPU as a static unrolled shift-accumulate instead of a
lattice scatter/gather that XLA could not fuse.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift (H, W, C) by (dy, dx), zero-filling; static offsets."""
    h, w = x.shape[0], x.shape[1]
    pad = jnp.pad(x, ((abs(dy), abs(dy)), (abs(dx), abs(dx)), (0, 0)))
    return jax.lax.dynamic_slice(
        pad, (abs(dy) - dy, abs(dx) - dx, 0), x.shape)


@functools.partial(jax.jit, static_argnames=(
    'num_iters', 'radius', 'stride', 'sxy_gauss', 'compat_gauss',
    'sxy_bilateral', 'srgb', 'compat_bilateral'))
def crf_refine(rgb: jax.Array, prob_fg: jax.Array, num_iters: int = 5,
               radius: int = 31, stride: int = 2,
               sxy_gauss: float = 1.0, compat_gauss: float = 3.0,
               sxy_bilateral: float = 23.0, srgb: float = 7.0,
               compat_bilateral: float = 20.0) -> jax.Array:
    """Mean-field CRF over a 2-class (bg, fg) problem.

    Args:
      rgb: (H, W, 3) uint8/float image.
      prob_fg: (H, W) float in [0, 1] — raw mask probability.
      stride: bilateral window is sampled every ``stride`` pixels to bound the
        number of shift terms; with sxy=23 the kernel varies slowly so the
        subsampled sum is a close quadrature of the full window.

    Returns (H, W) float32 refined foreground probability.
    """
    img = rgb.astype(jnp.float32)
    p_fg = jnp.clip(prob_fg.astype(jnp.float32), 1e-5, 1.0 - 1e-5)
    # unary = -log(prob) per class, classes stacked on last dim: (H, W, 2)
    q = jnp.stack([1.0 - p_fg, p_fg], axis=-1)
    unary = -jnp.log(q)

    offsets = []
    for dy in range(-radius, radius + 1, stride):
        for dx in range(-radius, radius + 1, stride):
            if dy == 0 and dx == 0:
                continue
            offsets.append((dy, dx))

    # Precompute static spatial weights for both kernels.
    off = np.array(offsets, dtype=np.float32)
    d2 = (off ** 2).sum(axis=1)
    w_gauss = np.exp(-d2 / (2.0 * sxy_gauss ** 2)).astype(np.float32)
    w_bi_sp = np.exp(-d2 / (2.0 * sxy_bilateral ** 2)).astype(np.float32)
    # Account for subsampling: each sample stands for stride² window pixels.
    scale = float(stride * stride)

    def body(_, q):
        # message m_l(i) = sum_j k(i,j) q_l(j) for both kernels
        msg = jnp.zeros_like(q)
        for (dy, dx), wg, wb in zip(offsets, w_gauss, w_bi_sp):
            q_s = _shift2d(q, dy, dx)
            img_s = _shift2d(img, dy, dx)
            color2 = jnp.sum((img - img_s) ** 2, axis=-1, keepdims=True)
            k_bi = wb * jnp.exp(-color2 / (2.0 * srgb ** 2))
            msg = msg + (compat_gauss * wg * scale) * q_s \
                      + (compat_bilateral * scale) * k_bi * q_s
        # compatibility: Potts — penalize the *other* class's mass
        pairwise = msg[..., ::-1]
        logits = -unary - pairwise
        return jax.nn.softmax(logits, axis=-1)

    q = jax.lax.fori_loop(0, num_iters, body, q)
    return q[..., 1]


@functools.partial(jax.jit, static_argnames=(
    'num_iters', 'radius', 'stride', 'sxy_gauss', 'compat_gauss',
    'sxy_bilateral', 'srgb', 'compat_bilateral'))
def crf_refine_batch(rgb: jax.Array, prob_fg: jax.Array,
                     num_iters: int = 5, radius: int = 31, stride: int = 2,
                     sxy_gauss: float = 1.0, compat_gauss: float = 3.0,
                     sxy_bilateral: float = 23.0, srgb: float = 7.0,
                     compat_bilateral: float = 20.0) -> jax.Array:
    """vmapped CRF over a batch of equally-sized crops: (N,H,W,3),(N,H,W).

    Jitted at this level so an eager call is ONE cached dispatch (the
    batched mask-refinement path issues one of these per crop bucket and
    collects results only after every bucket is in flight)."""
    return jax.vmap(lambda im, p: crf_refine(
        im, p, num_iters=num_iters, radius=radius, stride=stride,
        sxy_gauss=sxy_gauss, compat_gauss=compat_gauss,
        sxy_bilateral=sxy_bilateral, srgb=srgb,
        compat_bilateral=compat_bilateral))(rgb, prob_fg)
