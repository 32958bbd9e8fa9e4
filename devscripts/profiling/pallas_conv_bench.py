"""Streaming Pallas conv vs XLA conv at LaMa-shell shapes (on the TPU)."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.ops.pallas_conv import (
    conv2d_stream, pack_strided_weight, pack_phase_weight,
    space_to_depth, depth_to_space)

rs = np.random.RandomState(0)


def timed(fn, *args, n=6, reps=16):
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


def xla_conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def check(name, y0, y1):
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                - y1.astype(jnp.float32))))
    print(f'  {name} max abs err: {err:.4f}  shapes {y0.shape} {y1.shape}')


def main():
    # ---- case 1: stem 7x7 4->64 @1536 (phase-packed s=4) ----
    x = jnp.asarray(rs.rand(1, 1542, 1542, 4).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rs.rand(7, 7, 4, 64).astype(np.float32) * .05,
                    jnp.bfloat16)
    wp_np, kp = pack_phase_weight(np.asarray(w, np.float32), 4)
    wp = jnp.asarray(wp_np, jnp.bfloat16)

    def stem_pallas(x):
        # pad 1542 -> 1544 (s=4 divisible), packed (386, 386, 64)
        xx = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
        xp = space_to_depth(xx, 4)
        out = conv2d_stream(xp, wp)      # (1, 386-kp+1, ., 1024)
        out = depth_to_space(out, 4)
        return out[:, :1536, :1536]

    y0 = jax.jit(lambda x: xla_conv(x, w))(x)[:, :1536, :1536]
    y1 = jax.jit(stem_pallas)(x)
    check('stem', y0, y1)
    t0 = timed(lambda x: xla_conv(x, w)[:, :1536, :1536]
               .astype(jnp.float32).sum(), x)
    t1 = timed(lambda x: stem_pallas(x).astype(jnp.float32).sum(), x)
    print(f'stem 7x7 4->64 @1536: xla {t0*1e3:.3f} ms  pallas {t1*1e3:.3f}')

    # ---- case 2: down1 3x3 s2 64->128 @1536 (strided-packed) ----
    x = jnp.asarray(rs.rand(1, 1538, 1538, 64).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rs.rand(3, 3, 64, 128).astype(np.float32) * .05,
                    jnp.bfloat16)
    wp_np, kp = pack_strided_weight(np.asarray(w, np.float32), 2)
    wp2 = jnp.asarray(wp_np, jnp.bfloat16)

    def down_pallas(x):
        xp = space_to_depth(x, 2)        # (1, 769, 769, 256)
        return conv2d_stream(xp, wp2)

    y0 = jax.jit(lambda x: xla_conv(x, w, 2))(x)
    y1 = jax.jit(down_pallas)(x)
    check('down1', y0, y1)
    t0 = timed(lambda x: xla_conv(x, w, 2).astype(jnp.float32).sum(), x)
    t1 = timed(lambda x: down_pallas(x).astype(jnp.float32).sum(), x)
    print(f'down1 3x3s2 64->128 @1536: xla {t0*1e3:.3f} ms  '
          f'pallas {t1*1e3:.3f}')

    # ---- case 3: big-spatial stride-1 3x3 128->128 @768 ----
    x = jnp.asarray(rs.rand(1, 770, 770, 128).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rs.rand(3, 3, 128, 128).astype(np.float32) * .05,
                    jnp.bfloat16)
    y0 = jax.jit(lambda x: xla_conv(x, w))(x)
    y1 = jax.jit(lambda x: conv2d_stream(x, w))(x)
    check('mid', y0, y1)
    t0 = timed(lambda x: xla_conv(x, w).astype(jnp.float32).sum(), x)
    t1 = timed(lambda x: conv2d_stream(x, w).astype(jnp.float32).sum(), x)
    gf = 768 * 768 * 9 * 128 * 128 * 2 / 1e9
    print(f'3x3 128->128 @768: xla {t0*1e3:.3f} ms ({gf/t0/1e3:.0f} TF/s) '
          f'pallas {t1*1e3:.3f} ms ({gf/max(t1,1e-9)/1e3:.0f} TF/s)')

    # ---- case 4: down2 3x3 s2 128->256 @768 ----
    x = jnp.asarray(rs.rand(1, 770, 770, 128).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rs.rand(3, 3, 128, 256).astype(np.float32) * .05,
                    jnp.bfloat16)
    wp_np, kp = pack_strided_weight(np.asarray(w, np.float32), 2)
    wp4 = jnp.asarray(wp_np, jnp.bfloat16)

    def down2_pallas(x):
        xp = space_to_depth(x, 2)        # (1, 385, 385, 512)
        return conv2d_stream(xp, wp4)
    y0 = jax.jit(lambda x: xla_conv(x, w, 2))(x)
    y1 = jax.jit(down2_pallas)(x)
    check('down2', y0, y1)
    t0 = timed(lambda x: xla_conv(x, w, 2).astype(jnp.float32).sum(), x)
    t1 = timed(lambda x: down2_pallas(x).astype(jnp.float32).sum(), x)
    print(f'down2 3x3s2 128->256 @768: xla {t0*1e3:.3f} ms  '
          f'pallas {t1*1e3:.3f}')


if __name__ == '__main__':
    main()
