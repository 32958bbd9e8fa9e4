"""Bilateral filter on device.

The reference smooths the page with cv2.bilateralFilter(img, 17, 80, 80)
before detection (detection/default.py:64) — a host call that costs seconds at
2048px. Here it is a jittable windowed filter: a fori_loop over window
offsets with rolled shifts, so compile size stays constant while the VPU does
the elementwise work fused with the rest of the detection preamble.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _use_pallas() -> bool:
    """Pallas VMEM-tiled kernel on TPU (measured 14.6 vs 21.9 ms @1536² on
    v5e, interior bit-identical); XLA roll-loop elsewhere.
    MIT_TPU_BILATERAL=xla|pallas overrides."""
    env = os.environ.get('MIT_TPU_BILATERAL', 'auto')
    if env == 'xla':
        return False
    if env == 'pallas':
        return True
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:       # pragma: no cover - backend probe failure
        return False


def bilateral_filter(img: jax.Array, d: int = 17, sigma_color: float = 80.0,
                     sigma_space: float = 80.0) -> jax.Array:
    if _use_pallas():
        from .pallas_bilateral import bilateral_filter_pallas
        return bilateral_filter_pallas(img, d, sigma_color, sigma_space)
    return bilateral_filter_xla(img, d, sigma_color, sigma_space)


def bilateral_filter_batch(imgs: jax.Array, d: int = 17,
                           sigma_color: float = 80.0,
                           sigma_space: float = 80.0) -> jax.Array:
    """(N, H, W, C) batch. The Pallas kernel's manual halo DMA has no vmap
    batching rule, so the batch runs as a sequential on-device map (the
    kernel already saturates HBM bandwidth — batching adds nothing)."""
    if _use_pallas():
        from .pallas_bilateral import bilateral_filter_pallas
        return jax.lax.map(
            lambda im: bilateral_filter_pallas(im, d, sigma_color,
                                               sigma_space), imgs)
    return jax.vmap(
        lambda im: bilateral_filter_xla(im, d, sigma_color, sigma_space)
    )(imgs)


@functools.partial(jax.jit,
                   static_argnames=('d', 'sigma_color', 'sigma_space'))
def bilateral_filter_xla(img: jax.Array, d: int = 17,
                         sigma_color: float = 80.0,
                         sigma_space: float = 80.0) -> jax.Array:
    """Edge-preserving smoothing of an (H, W, C) image.

    Matches cv2.bilateralFilter semantics: window diameter ``d``, gaussian
    space weight over pixel distance, gaussian color weight over intensity
    difference (summed over channels per cv2).
    """
    radius = d // 2
    # keep the source in its narrow dtype: the tap loop is HBM-bound, and
    # rolling uint8 reads 4x less than rolling fp32 (conversion to fp32
    # happens in-register inside the fused tap kernel, values identical)
    src = img
    x = img.astype(jnp.float32)

    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if dy * dy + dx * dx <= radius * radius]
    offsets = jnp.asarray(np.array(offs, dtype=np.int32))
    space_w_np = np.exp(-(np.array(offs) ** 2).sum(1)
                        / (2.0 * sigma_space ** 2)).astype(np.float32)
    space_w = jnp.asarray(space_w_np)

    gauss_color = -1.0 / (2.0 * sigma_color ** 2)

    def tap(acc, norm, dy, dx, sw):
        shifted = jnp.roll(src, (-dy, -dx), axis=(0, 1)).astype(jnp.float32)
        cdiff = jnp.abs(shifted - x).sum(axis=-1, keepdims=True)
        w = sw * jnp.exp(gauss_color * cdiff * cdiff)
        return acc + w * shifted, norm + w

    # measured on v5e @1536²: dynamic-shift fori with unroll=8 beats a full
    # static unroll (51 vs 65 ms single page) — the static version
    # materializes per-tap shifted copies instead of fusing
    def body(i, carry):
        return tap(*carry, offsets[i, 0], offsets[i, 1], space_w[i])
    acc, norm = jax.lax.fori_loop(
        0, len(offs), body,
        (jnp.zeros_like(x), jnp.zeros(x.shape[:2] + (1,), jnp.float32)),
        unroll=8)
    out = acc / jnp.maximum(norm, 1e-8)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(img.dtype)
