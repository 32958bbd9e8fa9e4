"""How far off roofline are XLA's 3x3 convs at LaMa block shapes?

Robust harness: min-over-calls with reps=64 on-device loop (the axon tunnel
call floor is ~35-60 ms with high variance; min is robust where mean is not).
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

H = W = 192
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
    ts = []
    fs = []
    for _ in range(n):
        t0 = time.perf_counter(); float(looped(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0) / reps


def conv3(x, w, out_dt=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(out_dt)


def main():
    for name, ci, co in (('l2l 128->128', 128, 128),
                         ('l2g 128->384', 128, 384),
                         ('g2l 384->128', 384, 128),
                         ('fused 128->512', 128, 512),
                         ('512->512', 512, 512)):
        wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * .05,
                         jnp.bfloat16)
        xi = jnp.asarray(rs.rand(1, H, W, ci).astype(np.float32),
                         jnp.bfloat16)
        t = timed(lambda x, w=wt: conv3(x, w).astype(jnp.float32).sum(), xi)
        gf = H * W * 9 * ci * co * 2 / 1e9
        print(f'conv3 {name}: {t*1e3:.3f} ms ({gf/max(t,1e-9)/1e3:.1f} TF/s)')

    # f32 output (no cast) for comparison
    ci, co = 128, 128
    wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32), jnp.bfloat16)
    xi = jnp.asarray(rs.rand(1, H, W, ci).astype(np.float32), jnp.bfloat16)
    t = timed(lambda x: conv3(x, wt, jnp.float32).sum(), xi)
    print(f'conv3 128->128 f32-out: {t*1e3:.3f} ms')

    # matmul equivalent cost (what the MXU could do): im2col-free 1x1 x9
    xb = jnp.asarray(rs.rand(H * W, 9 * 128).astype(np.float32), jnp.bfloat16)
    wb = jnp.asarray(rs.rand(9 * 128, 128).astype(np.float32), jnp.bfloat16)
    t = timed(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
              .astype(jnp.float32).sum(), xb, wb)
    gf = H * W * 9 * 128 * 128 * 2 / 1e9
    print(f'equiv matmul (36864x1152)@(1152x128): {t*1e3:.3f} ms '
          f'({gf/max(t,1e-9)/1e3:.1f} TF/s)')

    # stem shape: 1536^2, 4->64, 7x7
    x = jnp.asarray(rs.rand(1, 1542, 1542, 4).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rs.rand(7, 7, 4, 64).astype(np.float32), jnp.bfloat16)

    def stem(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    t = timed(lambda x: stem(x).astype(jnp.float32).sum(), x, reps=16)
    print(f'stem 7x7 4->64 @1536: {t*1e3:.3f} ms')

    # downsample: 3x3 s2 64->128 @1536
    x = jnp.asarray(rs.rand(1, 1536, 1536, 64).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rs.rand(3, 3, 64, 128).astype(np.float32), jnp.bfloat16)

    def down(x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    t = timed(lambda x: down(x).astype(jnp.float32).sum(), x, reps=16)
    gf = 768 * 768 * 9 * 64 * 128 * 2 / 1e9
    print(f'down1 3x3s2 64->128 @1536: {t*1e3:.3f} ms '
          f'({gf/max(t,1e-9)/1e3:.1f} TF/s)')


if __name__ == '__main__':
    main()
