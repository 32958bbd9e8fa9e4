"""Is one 512->512 3x3 conv faster than the FFC's three small convs?

The FFC local path runs convl2l (128->128), convg2l (384->128) and convl2g
(128->384) as separate 3x3 convs whose small N underutilizes the MXU. They
can be fused EXACTLY into a single conv over [x_l | x_g] producing
[out_l | out_g_spatial] with a zero weight block for the (x_g -> out_g)
spatial path (the real g->g path is the spectral transform).
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

H = W = 192
CL, CG = 128, 384
REPS = 16

def timed(fn, *args, n=10):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

def floor_time():
    z = jnp.zeros((8, 128), jnp.float32)
    @jax.jit
    def tiny(z):
        return z.sum()
    return timed(tiny, z)

rs = np.random.RandomState(0)
xl = jnp.asarray(rs.rand(1, H, W, CL).astype(np.float32), jnp.bfloat16)
xg = jnp.asarray(rs.rand(1, H, W, CG).astype(np.float32), jnp.bfloat16)

w_l2l = jnp.asarray(rs.randn(3, 3, CL, CL).astype(np.float32) * 0.05,
                    jnp.bfloat16)
w_g2l = jnp.asarray(rs.randn(3, 3, CG, CL).astype(np.float32) * 0.05,
                    jnp.bfloat16)
w_l2g = jnp.asarray(rs.randn(3, 3, CL, CG).astype(np.float32) * 0.05,
                    jnp.bfloat16)

def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)

def split_version(xl, xg):
    ol = conv(xl, w_l2l) + conv(xg, w_g2l)
    og = conv(xl, w_l2g)
    return ol, og

# fused: weight ((3,3,512,512)) = [[l2l, l2g], [g2l, 0]]
w_fused = jnp.concatenate([
    jnp.concatenate([w_l2l, w_l2g], axis=3),
    jnp.concatenate([w_g2l, jnp.zeros((3, 3, CG, CG), jnp.bfloat16)],
                    axis=3),
], axis=2)

def fused_version(xl, xg):
    out = conv(jnp.concatenate([xl, xg], axis=-1), w_fused)
    return out[..., :CL], out[..., CL:]

def bench(version, label):
    @jax.jit
    def looped(xl, xg):
        def body(i, carry):
            a, b, s = carry
            ol, og = version(a, b)
            return (ol, b + og * jnp.bfloat16(0.1),
                    s + ol.astype(jnp.float32).sum())
        _, _, s = jax.lax.fori_loop(
            0, REPS, body, (xl, xg, jnp.float32(0)))
        return s
    t = (timed(looped, xl, xg) - FLOOR) / REPS
    print(f'{label}: {t*1000:.3f} ms per FFC local path')
    return t

FLOOR = floor_time()
print(f'call floor: {FLOOR*1000:.1f} ms')
t_split = bench(split_version, 'split (3 convs)')
t_fused = bench(fused_version, 'fused (1 conv)')
print(f'speedup: {t_split/t_fused:.2f}x')

# numerical check
ol1, og1 = split_version(xl, xg)
ol2, og2 = fused_version(xl, xg)
print('max |diff| ol:', float(jnp.max(jnp.abs(ol1.astype(jnp.float32)
                                              - ol2.astype(jnp.float32)))))
print('max |diff| og:', float(jnp.max(jnp.abs(og1.astype(jnp.float32)
                                              - og2.astype(jnp.float32)))))
