"""Bilateral filter as a Pallas TPU kernel.

The XLA formulation (ops/bilateral.py) does one full-array roll per window
offset — ~289 HBM round trips of the whole page (~16 GB of traffic at
1536²). This kernel tiles rows into VMEM once and does all shifts on-chip:
HBM traffic drops to ~2× the image size.

Layout: channel-major (C, H, W) so the page width maps to lanes; row tiles
are DMA'd manually with their halo (overlapping windows are not expressible
as BlockSpecs).
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64


def _space_weight_table(radius: int, sigma_space: float) -> np.ndarray:
    """(2r+1, 2r+1) gaussian space weights, zero outside the cv2 circular
    window."""
    dy, dx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    d2 = (dy ** 2 + dx ** 2).astype(np.float64)
    table = np.exp(-d2 / (2.0 * sigma_space ** 2))
    table[d2 > radius * radius] = 0.0
    return table.astype(np.float32)


def _kernel(sw_ref, img_hbm, out_ref, scratch, sem,
            *, radius: int, tile_h: int, width: int, gauss_color: float):
    i = pl.program_id(0)
    # DMA this tile + halo from HBM (input is pre-padded by `radius` rows
    # and columns, so the window never leaves bounds)
    copy = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * tile_h, tile_h + 2 * radius), :],
        scratch, sem)
    copy.start()
    copy.wait()

    center = scratch[:, radius:radius + tile_h, radius:radius + width]
    center = center.astype(jnp.float32)

    side = 2 * radius + 1
    halo_h = tile_h + 2 * radius
    halo_w = scratch.shape[2]  # lane-padded to a multiple of 128

    # one fori_loop over all window offsets; the shifted window is realized
    # with pltpu.roll (dynamic circular shift) + a zero-offset slice.
    # Mosaic rejects dynamic strided loads AND non-8-aligned sublane slices
    # of register values (both crash the compiler), but dynamic rotates are
    # fine, and this keeps the program ~300x smaller than a static tap
    # unroll (which took >25 min through the remote-compile tunnel).
    def tap(t, carry):
        acc, norm = carry
        dy_i = t // side
        dx_i = t % side
        planes = []
        for c in range(3):
            p = pltpu.roll(scratch[c], (halo_h - dy_i) % halo_h, 0)
            p = pltpu.roll(p, (halo_w - dx_i) % halo_w, 1)
            planes.append(p[:tile_h, :width].astype(jnp.float32))
        sh = jnp.stack(planes, axis=0)
        cdiff = jnp.sum(jnp.abs(sh - center), axis=0)
        w = sw_ref[dy_i, dx_i] * jnp.exp(gauss_color * cdiff * cdiff)
        return acc + w[None] * sh, norm + w

    acc, norm = jax.lax.fori_loop(
        0, side * side, tap,
        (jnp.zeros((3, tile_h, width), jnp.float32),
         jnp.zeros((tile_h, width), jnp.float32)))
    out_ref[...] = acc / jnp.maximum(norm, 1e-8)[None]


def _kernel_hoisted(sw_ref, img_hbm, out_ref, scratch, sem,
                    *, radius: int, tile_h: int, width: int,
                    gauss_color: float):
    """Nested dy/dx loops with the row shift HOISTED: the v1 kernel does 6
    full-halo-plane rolls per tap (2 dims x 3 channels); here each dy rolls
    rows once (3 rolls per 2r+1 taps) and the inner dx loop only rolls
    columns of the already-row-shifted (tile_h, halo_w) planes — ~2x less
    VPU data movement, which dominates this kernel (the exp is cheap by
    comparison). With bf16 scratch (uint8 pixel values are exact in bf16)
    the moved bytes halve again; all arithmetic stays f32 so the output is
    bit-identical to the v1 kernel."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * tile_h, tile_h + 2 * radius), :],
        scratch, sem)
    copy.start()
    copy.wait()

    center = scratch[:, radius:radius + tile_h, radius:radius + width]
    center = center.astype(jnp.float32)

    side = 2 * radius + 1
    halo_h = tile_h + 2 * radius
    halo_w = scratch.shape[2]

    def row(dy_i, carry):
        rows = [pltpu.roll(scratch[c], (halo_h - dy_i) % halo_h, 0)[:tile_h]
                for c in range(3)]

        def col(dx_i, carry2):
            acc, norm = carry2
            planes = [
                pltpu.roll(rows[c], (halo_w - dx_i) % halo_w, 1)
                [:, :width].astype(jnp.float32)
                for c in range(3)]
            sh = jnp.stack(planes, axis=0)
            cdiff = jnp.sum(jnp.abs(sh - center), axis=0)
            w = sw_ref[dy_i, dx_i] * jnp.exp(gauss_color * cdiff * cdiff)
            return acc + w[None] * sh, norm + w

        return jax.lax.fori_loop(0, side, col, carry)

    acc, norm = jax.lax.fori_loop(
        0, side, row,
        (jnp.zeros((3, tile_h, width), jnp.float32),
         jnp.zeros((tile_h, width), jnp.float32)))
    out_ref[...] = acc / jnp.maximum(norm, 1e-8)[None]


def _kernel_skip(sw_ref, dy_ref, dx_ref, img_hbm, out_ref, scratch, sem,
                 *, radius: int, tile_h: int, width: int,
                 gauss_color: float, n_taps: int):
    """Circular-window tap skip: cv2's window zeroes the space weight
    outside d² > r² (~32% of the (2r+1)² square at r=8), and the square
    kernels still pay full VPU arithmetic for those zero-contribution taps.
    This variant iterates ONLY the valid taps: one flat fori over the
    ``n_taps`` in-circle offsets, with (dy, dx) read from the two
    SMEM-prefetched lists (the kernel is VPU-arithmetic-bound — the v3
    hoisted-roll experiment measured the rolls ~free — so fewer taps cuts
    the dominant cost proportionally). A static per-dy unroll was tried
    first and blew the 16M scoped-VMEM stack (17 live row buffers).
    Zero-weight taps add exactly 0 to acc and norm, so skipping them is
    bit-identical."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * tile_h, tile_h + 2 * radius), :],
        scratch, sem)
    copy.start()
    copy.wait()

    center = scratch[:, radius:radius + tile_h, radius:radius + width]
    center = center.astype(jnp.float32)

    halo_h = tile_h + 2 * radius
    halo_w = scratch.shape[2]

    def tap(t, carry):
        acc, norm = carry
        dy_i = dy_ref[t]
        dx_i = dx_ref[t]
        planes = []
        for c in range(3):
            p = pltpu.roll(scratch[c], (halo_h - dy_i) % halo_h, 0)
            p = pltpu.roll(p, (halo_w - dx_i) % halo_w, 1)
            planes.append(p[:tile_h, :width].astype(jnp.float32))
        sh = jnp.stack(planes, axis=0)
        cdiff = jnp.sum(jnp.abs(sh - center), axis=0)
        w = sw_ref[dy_i, dx_i] * jnp.exp(gauss_color * cdiff * cdiff)
        return acc + w[None] * sh, norm + w

    acc, norm = jax.lax.fori_loop(
        0, n_taps, tap,
        (jnp.zeros((3, tile_h, width), jnp.float32),
         jnp.zeros((tile_h, width), jnp.float32)))
    out_ref[...] = acc / jnp.maximum(norm, 1e-8)[None]


# degree-5 least-squares fit of 2^f on [0, 1] (rel err ~3e-8): the 'poly'
# fast-exp path computes exp(x) = 2^n * 2^f with the integer scale built by
# exponent-field bit assembly — ~12 cheap VPU ops replacing the
# transcendental. Coefficients are deterministic (np.polyfit at import).
_EXP2_COEFFS = np.polyfit(np.linspace(0, 1, 512),
                          np.exp2(np.linspace(0, 1, 512)), 5)
_LOG2E = 1.4426950408889634


def _fast_exp_mode() -> str:
    """'off' (hardware exp) / 'poly' (bit-assembled exp2 approximation) /
    'skip' (REPLACES exp with one multiply — WRONG results, timing bound
    for probes only)."""
    return os.environ.get('MIT_TPU_BILATERAL_EXP', 'off')


def _exp_fast(x):
    """exp(x) for x <= 0 via 2^n * poly(f); rel err ~3e-8."""
    y = jnp.maximum(x * _LOG2E, -126.0)
    n = jnp.floor(y)
    f = y - n
    p = jnp.float32(_EXP2_COEFFS[0])
    for c in _EXP2_COEFFS[1:]:
        p = p * f + jnp.float32(c)
    scale = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * scale


def _range_weight(cdiff, gauss_color: float, fast_exp: str):
    if fast_exp == 'skip':
        return 1.0 + gauss_color * cdiff * cdiff
    if fast_exp == 'poly':
        return _exp_fast(gauss_color * cdiff * cdiff)
    return jnp.exp(gauss_color * cdiff * cdiff)


def _kernel_fullhalo(sw_ref, ry_ref, rx_ref, img_hbm, out_ref, scratch, sem,
                     *, radius: int, tile_h: int, width: int,
                     gauss_color: float, n_taps: int,
                     fast_exp: str = 'off'):
    """Full-halo channelwise accumulation (v5). The v4 kernel pays, per tap,
    three slice copies ([:tile_h, :width] of each rolled plane), one
    ``jnp.stack`` copy and a broadcast multiply — pure VMEM data movement,
    the scarce resource on v5e (the r3 hoisted-roll A/B showed the rolls
    themselves are ~free). Here each tap is 6 rolls + channelwise
    arithmetic on the FULL (halo_h, halo_w) planes with no per-tap
    reshaping; the output window is sliced ONCE at the end. The halo ring
    computes garbage (wraparound) that the final slice discards — the kept
    region reads only in-bounds rows/cols, so results are bit-identical to
    v1/v4 (same f32 ops in the same tap order). Arithmetic grows by
    halo/tile pixel ratio (~1.25x at tile 64) but all per-tap copies go
    away.

    Prefetched scalars: flat space weights sw_ref[t] plus per-tap roll
    amounts ry_ref/rx_ref (precomputed host-side: roll by radius - dy)."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * tile_h, tile_h + 2 * radius), :],
        scratch, sem)
    copy.start()
    copy.wait()

    c0 = scratch[0]
    c1 = scratch[1]
    c2 = scratch[2]
    halo_h = tile_h + 2 * radius
    halo_w = scratch.shape[2]

    def tap(t, carry):
        a0, a1, a2, norm = carry
        ry = ry_ref[t]
        rx = rx_ref[t]
        p0 = pltpu.roll(pltpu.roll(c0, ry, 0), rx, 1)
        p1 = pltpu.roll(pltpu.roll(c1, ry, 0), rx, 1)
        p2 = pltpu.roll(pltpu.roll(c2, ry, 0), rx, 1)
        cdiff = (jnp.abs(p0 - c0) + jnp.abs(p1 - c1) + jnp.abs(p2 - c2))
        w = sw_ref[t] * _range_weight(cdiff, gauss_color, fast_exp)
        return a0 + w * p0, a1 + w * p1, a2 + w * p2, norm + w

    z = jnp.zeros((halo_h, halo_w), jnp.float32)
    a0, a1, a2, norm = jax.lax.fori_loop(0, n_taps, tap, (z, z, z, z))
    norm = jnp.maximum(norm, 1e-8)
    # realign with rolls + zero-offset slices (Mosaic rejects non-8-aligned
    # sublane slices of register values; radius is 8 in production but not
    # in general)
    for c, acc in enumerate((a0, a1, a2)):
        r = acc / norm
        r = pltpu.roll(r, (halo_h - radius) % halo_h, 0)
        r = pltpu.roll(r, (halo_w - radius) % halo_w, 1)
        out_ref[c] = r[:tile_h, :width]


def _kernel_paired(sw_ref, rpy_ref, rpx_ref, rmy_ref, rmx_ref,
                   img_hbm, out_ref, scratch, sem,
                   *, radius: int, tile_h: int, width: int,
                   gauss_color: float, n_pairs: int,
                   fast_exp: str = 'off'):
    """Symmetric-pair weight sharing (v6). The bilateral weight is symmetric
    in its two pixels: w(p, p+o) = space(o) * range(|I(p) - I(p+o)|) =
    w(p+o, p). So the taps at offsets +o and -o share ONE weight plane —
    W_{-o}(p) = W_{+o}(p-o) is just a roll of W_{+o}. One iteration handles
    a pair: compute W once (one cdiff reduction + one exp instead of two),
    accumulate the +o contribution from the already-shifted planes and the
    -o contribution from the opposite shift with the rolled weight plane.
    Per pair vs two v5 taps: cdiff ALU halves (8 ops vs 16), exp halves,
    rolls grow 12 -> 14 (the W roll) — a net win iff the kernel is
    ALU-bound, which the r5 exp A/B indicated (rolls+FMA volume dominate,
    per-tap copies already gone in v5).

    Validity: for the kept region (rows [r, r+tile), cols [r, r+w) of the
    scratch halo) every read lands in-bounds — W at p-o needs I(p-o) and
    I(p), both within the halo for |o| <= radius — so the wraparound
    garbage all lands in the discarded halo ring exactly as in v5. The
    center tap (o=0, weight exactly 1.0) seeds the accumulators. f32 sums
    associate differently than v5's flat tap order, so the result is
    float-close, not bit-equal (<= 1 uint8 gray level after rounding).

    Prefetched scalars: per-pair space weights sw_ref, +o roll amounts
    rpy/rpx, -o roll amounts rmy/rmx (also the W-plane roll)."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * tile_h, tile_h + 2 * radius), :],
        scratch, sem)
    copy.start()
    copy.wait()

    c0 = scratch[0]
    c1 = scratch[1]
    c2 = scratch[2]

    def pair(t, carry):
        a0, a1, a2, norm = carry
        rpy = rpy_ref[t]
        rpx = rpx_ref[t]
        q0 = pltpu.roll(pltpu.roll(c0, rpy, 0), rpx, 1)
        q1 = pltpu.roll(pltpu.roll(c1, rpy, 0), rpx, 1)
        q2 = pltpu.roll(pltpu.roll(c2, rpy, 0), rpx, 1)
        cdiff = (jnp.abs(q0 - c0) + jnp.abs(q1 - c1) + jnp.abs(q2 - c2))
        wp = sw_ref[t] * _range_weight(cdiff, gauss_color, fast_exp)
        rmy = rmy_ref[t]
        rmx = rmx_ref[t]
        m0 = pltpu.roll(pltpu.roll(c0, rmy, 0), rmx, 1)
        m1 = pltpu.roll(pltpu.roll(c1, rmy, 0), rmx, 1)
        m2 = pltpu.roll(pltpu.roll(c2, rmy, 0), rmx, 1)
        wm = pltpu.roll(pltpu.roll(wp, rmy, 0), rmx, 1)
        return (a0 + wp * q0 + wm * m0,
                a1 + wp * q1 + wm * m1,
                a2 + wp * q2 + wm * m2,
                norm + wp + wm)

    # center tap: space and range weights are both exactly 1
    one = jnp.ones_like(c0)
    a0, a1, a2, norm = jax.lax.fori_loop(
        0, n_pairs, pair, (c0 * 1.0, c1 * 1.0, c2 * 1.0, one))
    halo_h = tile_h + 2 * radius
    halo_w = scratch.shape[2]
    norm = jnp.maximum(norm, 1e-8)
    for c, acc in enumerate((a0, a1, a2)):
        r = acc / norm
        r = pltpu.roll(r, (halo_h - radius) % halo_h, 0)
        r = pltpu.roll(r, (halo_w - radius) % halo_w, 1)
        out_ref[c] = r[:tile_h, :width]


def _valid_pairs(radius: int) -> tuple:
    """(dy, dx) offset lists (actual offsets, not table indices) of one
    representative per symmetric pair of the cv2 circular window: dy > 0,
    or dy == 0 and dx > 0. The center (0, 0) is handled separately."""
    dys, dxs = [], []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx <= radius * radius and (
                    dy > 0 or (dy == 0 and dx > 0)):
                dys.append(dy)
                dxs.append(dx)
    return np.asarray(dys, np.int32), np.asarray(dxs, np.int32)


def _valid_taps(radius: int) -> tuple:
    """(dy, dx) index lists (0-based into the (2r+1)² table) of the cv2
    circular window (d² <= r²)."""
    dys, dxs = [], []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx <= radius * radius:
                dys.append(dy + radius)
                dxs.append(dx + radius)
    return np.asarray(dys, np.int32), np.asarray(dxs, np.int32)


def _variant() -> str:
    """'v1' — per-tap 2D rolls, f32 scratch (the r2 kernel);
    'v2' — hoisted row rolls, bf16 scratch: NOT compilable on current
    Mosaic ("Rotate with non-32-bit data" unimplemented) — kept for
    interpret-mode tests and future Mosaic versions;
    'v3' — hoisted row rolls, f32 scratch;
    'v4' — circular-window tap skip;
    'v5' — tap skip + full-halo channelwise accumulation (no per-tap
    slice/stack copies): MEASURED 7.96 vs v4 10.30 vs v1 14.74 ms @1536²
    on v5e (r4, bilateral_variant_ab) — DEFAULT;
    'v5w'/'v5m' — v5 at 128/96-row tiles (smaller halo ring): v5w fails
    to compile (VMEM overflow, JaxRuntimeError, recorded r4);
    'v6' — symmetric-pair weight sharing on top of v5 (one cdiff+exp per
    tap PAIR; <=1 gray level vs v1 from f32 reassociation, not bit-equal):
    MEASURED 7.96/8.03 vs v5 9.15/9.03 ms @1536² (r5, interleaved) — 12%
    off; detection boxes on the r5 probe pages deviate LESS than the v5
    path's own sensitivity to a uniform +1-gray input dither
    (det_box_parity_v6.py calibration) — DEFAULT."""
    import os
    return os.environ.get('MIT_TPU_BILATERAL_KERNEL', 'v6')


@functools.partial(jax.jit,
                   static_argnames=('d', 'sigma_color', 'sigma_space',
                                    'variant'))
def bilateral_filter_pallas(img: jax.Array, d: int = 17,
                            sigma_color: float = 80.0,
                            sigma_space: float = 80.0,
                            variant: str = None) -> jax.Array:
    """(H, W, 3) image → bilateral-smoothed, cv2 semantics (circular window,
    L1 color distance, gaussian space/color weights)."""
    if variant is None:
        variant = _variant()
    radius = d // 2
    h, w = img.shape[:2]
    # v5w: wider row tiles amortize the halo ring the full-halo kernel
    # computes garbage on (ratio 1.125 vs 1.25 at 64) for ~2.4x the VMEM
    tile_h = {'v5w': 128, 'v5m': 96}.get(variant, TILE_H)
    tiles = -(-h // tile_h)
    pad_h = tiles * tile_h - h
    # dynamic lane rotation needs the lane dim to be a multiple of 128;
    # the extra columns carry edge padding and are never read back
    halo_w = -(-(w + 2 * radius) // 128) * 128

    scratch_dtype = jnp.bfloat16 if variant == 'v2' else jnp.float32
    x = img.astype(jnp.float32).transpose(2, 0, 1)  # (3, H, W)
    x = jnp.pad(x, ((0, 0), (radius, radius + pad_h),
                    (radius, halo_w - w - radius)), mode='edge')
    x = x.astype(scratch_dtype)

    space_w = _space_weight_table(radius, sigma_space)
    gauss_color = -1.0 / (2.0 * sigma_color ** 2)

    if variant == 'v4':
        dys, dxs = _valid_taps(radius)
        kernel = functools.partial(
            _kernel_skip, radius=radius, tile_h=tile_h, width=w,
            gauss_color=gauss_color, n_taps=len(dys))
        prefetch = (jnp.asarray(space_w), jnp.asarray(dys),
                    jnp.asarray(dxs))
    elif variant == 'v6':
        dys, dxs = _valid_pairs(radius)
        halo_h = tile_h + 2 * radius
        sw_flat = space_w[dys + radius, dxs + radius]
        rpys = (halo_h - dys) % halo_h       # out[s] = c[s + dy]
        rpxs = (halo_w - dxs) % halo_w
        rmys = dys % halo_h                  # out[s] = c[s - dy]
        rmxs = dxs % halo_w
        kernel = functools.partial(
            _kernel_paired, radius=radius, tile_h=tile_h, width=w,
            gauss_color=gauss_color, n_pairs=len(dys),
            fast_exp=_fast_exp_mode())
        prefetch = (jnp.asarray(sw_flat), jnp.asarray(rpys, jnp.int32),
                    jnp.asarray(rpxs, jnp.int32),
                    jnp.asarray(rmys, jnp.int32),
                    jnp.asarray(rmxs, jnp.int32))
    elif variant in ('v5', 'v5w', 'v5m'):
        dys, dxs = _valid_taps(radius)
        halo_h = tile_h + 2 * radius
        sw_flat = space_w[dys, dxs]
        rys = (halo_h - (dys - radius)) % halo_h
        rxs = (halo_w - (dxs - radius)) % halo_w
        kernel = functools.partial(
            _kernel_fullhalo, radius=radius, tile_h=tile_h, width=w,
            gauss_color=gauss_color, n_taps=len(dys),
            fast_exp=_fast_exp_mode())
        prefetch = (jnp.asarray(sw_flat), jnp.asarray(rys, jnp.int32),
                    jnp.asarray(rxs, jnp.int32))
    else:
        kernel = functools.partial(
            _kernel if variant == 'v1' else _kernel_hoisted,
            radius=radius, tile_h=tile_h, width=w,
            gauss_color=gauss_color)
        prefetch = (jnp.asarray(space_w),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, tile_h, w), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2 * radius, halo_w), scratch_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, tiles * tile_h, w), jnp.float32),
    )(*prefetch, x)

    out = out[:, :h, :].transpose(1, 2, 0)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(img.dtype)
