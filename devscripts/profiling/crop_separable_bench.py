"""Device crop extraction: gather path vs separable matmul path, 16-crop
chunk at bucket 1024 (VERDICT r2 #7: target ≤5 ms/chunk; gather path
measured ~21 ms in r2)."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from manga_image_translator_tpu.ops import warp

N = 16
BW = 1024
TH = 48
PAGE = 1536


REPS = 8


def timed(fn, n=6):
    """Loop REPS executions inside one jit with a serializing carry and
    subtract the per-call tunnel floor (bench.py methodology — a single
    call is dominated by the ~35-60 ms round trip)."""

    @jax.jit
    def looped():
        def body(i, s):
            return s + jnp.sum(fn(s * 0))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def tiny():
        return jnp.float32(1)

    for _ in range(3):
        float(looped())
        float(tiny())
    floors = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(tiny())
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(looped())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - floor, 0.0) / REPS


def main():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 255, (PAGE, PAGE, 3), dtype=np.uint8))
    Hs, valid = [], []
    for i in range(N):
        x0, y0 = 40 + i * 60, 60 + i * 80
        quadw = 900
        pts = np.array([[x0, y0], [x0 + quadw, y0],
                        [x0 + quadw, y0 + 64], [x0, y0 + 64]])
        w = round(TH * quadw / 64)
        H = warp.homography_from_quad(pts.astype(np.float64), w, TH)
        Hs.append(H)
        valid.append(min(w, BW))
    Hs = np.stack(Hs)
    valid = np.asarray(valid, np.int32)

    Hs_j = jnp.asarray(Hs, jnp.float32)
    valid_j = jnp.asarray(valid)
    t_g = timed(lambda bump: warp.crop_batch(
        img, Hs_j + bump, valid_j, out_h=TH, out_w=BW))
    print(f'gather crop_batch {N}x{TH}x{BW}: {t_g*1e3:.1f} ms')

    plans = [warp.separable_plan(H, TH, BW, warp.SEP_SRC_H, 2 * BW)
             for H in Hs]
    assert all(p is not None for p in plans)
    origins = jnp.asarray([p[0] for p in plans], jnp.int32)
    ycoef = jnp.asarray([p[1] for p in plans], jnp.float32)
    xcoef = jnp.asarray([p[2] for p in plans], jnp.float32)
    t_s = timed(lambda bump: warp.crop_batch_separable(
        img, origins, ycoef + bump, xcoef, valid_j, TH, BW,
        warp.SEP_SRC_H, 2 * BW))
    print(f'separable matmul {N}x{TH}x{BW}: {t_s*1e3:.1f} ms')


if __name__ == '__main__':
    main()
