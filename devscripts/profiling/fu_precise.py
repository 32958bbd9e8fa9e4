"""Precise FourierUnit + spectral-transform breakdown (min-based harness),
plus phase-packed (space-to-depth) variants of the 1536px stem/downsample
convs that measured 12-20x off roofline under XLA's direct lowering.
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models.lama import (
    _fourier_unit, _spectral_transform, _resnet_block, _rfft2_matmul,
    _irfft2_matmul, init_params)
from manga_image_translator_tpu.models.functional import P

H = W = 192
C = 192
CG = 384
rs = np.random.RandomState(0)


def timed(fn, *args, n=6, reps=64):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + fn(*bumped)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    for _ in range(3):
        float(looped(*args)); float(tiny(z))
    ts, fs = [], []
    for _ in range(n):
        t0 = time.perf_counter(); float(looped(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0) / reps


def main():
    params = init_params(n_blocks=1)
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in params.items()}
    pre = 'model.5.conv1.ffc.convg2g'
    fu_p = P(params).scope(f'{pre}.fu')
    st_p = P(params).scope(pre)
    bp = P(params).scope('model.5')

    x = jnp.asarray(rs.rand(1, H, W, C).astype(np.float32), jnp.bfloat16)
    xg = jnp.asarray(rs.rand(1, H, W, CG).astype(np.float32), jnp.bfloat16)
    xl = jnp.asarray(rs.rand(1, H, W, 128).astype(np.float32), jnp.bfloat16)

    t = timed(lambda x: _fourier_unit(fu_p, x).astype(jnp.float32).sum(), x)
    print(f'FU v0            : {t*1e3:.3f} ms')

    def dft_roundtrip(x):
        re, im = _rfft2_matmul(x.astype(jnp.float32))
        out = _irfft2_matmul(re, im, H, W)
        return out.sum()
    t = timed(dft_roundtrip, x)
    print(f'DFT roundtrip    : {t*1e3:.3f} ms')

    def conv_only(x):
        n, h, w, c = x.shape
        stacked = jnp.broadcast_to(x[..., None, :],
                                   (n, h, W // 2 + 1, 2, c)
                                   ).reshape(n, h, W // 2 + 1, 2 * c) \
            if False else jnp.concatenate([x[:, :, :W // 2 + 1],
                                           x[:, :, :W // 2 + 1]], axis=-1)
        y = fu_p.conv('conv_layer', stacked)
        y = fu_p.bn('bn', y)
        return jax.nn.relu(y).astype(jnp.float32).sum()
    t = timed(conv_only, x)
    print(f'FU conv+bn+relu  : {t*1e3:.3f} ms (incl 1 concat)')

    t = timed(lambda x: _spectral_transform(st_p, x)
              .astype(jnp.float32).sum(), xg)
    print(f'spectral v0      : {t*1e3:.3f} ms')

    t = timed(lambda a, b: sum(o.astype(jnp.float32).sum()
                               for o in _resnet_block(bp, a, b)), xl, xg,
              reps=32)
    print(f'resnet block v0  : {t*1e3:.3f} ms (x18 = {t*18*1e3:.1f})')

    # ---------------- phase-packed stem / down1 ----------------
    # stem: reflect-padded input (1,1542,1542,4) -> 7x7 conv -> (1,1536,1536,64)
    x4 = jnp.asarray(rs.rand(1, 1542, 1542, 4).astype(np.float32),
                     jnp.bfloat16)
    w7 = jnp.asarray(rs.rand(7, 7, 4, 64).astype(np.float32) * .05,
                     jnp.bfloat16)

    def stem_direct(x):
        return jax.lax.conv_general_dilated(
            x, w7, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def s2d(x, s):
        n, h, w, c = x.shape
        x = x.reshape(n, h // s, s, w // s, s, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // s, w // s,
                                                     s * s * c)

    def pack_stem_weight(w, s):
        """(kh,kw,ci,co) stride-1 VALID kernel -> packed
        (kp,kp,s*s*ci,s*s*co) on the s2d grid. Output phase p at packed
        pixel Y reads input phase q=(p+dy)%s at packed offset t=(p+dy)//s."""
        kh, kw, ci, co = w.shape
        kp = (s - 1 + kh - 1) // s + 1
        wp = np.zeros((kp, kp, s * s * ci, s * s * co), np.float32)
        wnp = np.asarray(w, np.float32)
        for py in range(s):
            for px in range(s):
                for dy in range(kh):
                    for dx in range(kw):
                        ay, ax = py + dy, px + dx
                        qy, qx = ay % s, ax % s
                        ty, tx = ay // s, ax // s
                        icol = (qy * s + qx) * ci
                        ocol = (py * s + px) * co
                        wp[ty, tx, icol:icol + ci, ocol:ocol + co] += \
                            wnp[dy, dx]
        return jnp.asarray(wp, jnp.bfloat16), kp

    s = 2
    wp, kp = pack_stem_weight(w7, s)

    def stem_packed(x):
        xp = s2d(x, s)                      # (1, 771, 771, 16)
        out = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        n, hh2, ww2, _ = out.shape
        out = out.reshape(n, hh2, ww2, s, s, 64).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(n, hh2 * s, ww2 * s, 64)

    y0 = jax.jit(stem_direct)(x4)
    y1 = jax.jit(stem_packed)(x4)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                - y1.astype(jnp.float32))))
    print(f'stem packed vs direct: shapes {y0.shape} {y1.shape} err {err:.4f}')
    t0 = timed(lambda x: stem_direct(x).astype(jnp.float32).sum(), x4,
               reps=16)
    t1 = timed(lambda x: stem_packed(x).astype(jnp.float32).sum(), x4,
               reps=16)
    print(f'stem direct {t0*1e3:.3f} ms  packed {t1*1e3:.3f} ms')

    # down1: 3x3 s2 64->128 @1536 -> phase-pack input by 2, stride-2 becomes
    # packed stride 1 with 2x2 taps
    x64 = jnp.asarray(rs.rand(1, 1538, 1538, 64).astype(np.float32),
                      jnp.bfloat16)  # 1536 + 2*1 pad pre-applied
    w3 = jnp.asarray(rs.rand(3, 3, 64, 128).astype(np.float32) * .05,
                     jnp.bfloat16)

    def down_direct(x):
        return jax.lax.conv_general_dilated(
            x, w3, (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def pack_down_weight(w):
        """3x3 stride-2 kernel on s2d(2) input -> 2x2 kernel, 256->co,
        single output phase (stride 2 output = packed grid)."""
        kh, kw, ci, co = w.shape
        wp = np.zeros((2, 2, 4 * ci, co), np.float32)
        wnp = np.asarray(w, np.float32)
        for dy in range(kh):
            for dx in range(kw):
                qy, qx = dy % 2, dx % 2
                ty, tx = dy // 2, dx // 2
                icol = (qy * 2 + qx) * ci
                wp[ty, tx, icol:icol + ci, :] += wnp[dy, dx]
        return jnp.asarray(wp, jnp.bfloat16)

    w3p = pack_down_weight(w3)

    def down_packed(x):
        xp = s2d(x[:, :1538 // 2 * 2, :1538 // 2 * 2, :], 2)
        return jax.lax.conv_general_dilated(
            xp, w3p, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    y0 = jax.jit(down_direct)(x64)
    y1 = jax.jit(down_packed)(x64)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                - y1.astype(jnp.float32))))
    print(f'down packed vs direct: {y0.shape} {y1.shape} err {err:.4f}')
    t0 = timed(lambda x: down_direct(x).astype(jnp.float32).sum(), x64,
               reps=16)
    t1 = timed(lambda x: down_packed(x).astype(jnp.float32).sum(), x64,
               reps=16)
    print(f'down1 direct {t0*1e3:.3f} ms  packed {t1*1e3:.3f} ms')


if __name__ == '__main__':
    main()
