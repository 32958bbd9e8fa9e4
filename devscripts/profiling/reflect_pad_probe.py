"""Reflect-pad cost probe: the LaMa trunk's 108 3x3 convs and the shell's
stride-2 downs all reflect-pad their inputs (reference FFC padding_type).
XLA fuses ZERO padding into the conv itself but must materialize a padded
copy for reflect. Measures conv2d(reflect) vs conv2d(zero) at the real
shapes to size the win of an exact border-corrected zero-pad formulation.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models.functional import conv2d

REPS = 16


def timed(fn, *args, n=6):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(fn(*args))
        ts.append(time.perf_counter() - t0)

    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    fs = []
    for _ in range(5):
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0)


def loop(fn, label, *xs):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + fn(*bumped).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    t = timed(looped, *xs) / REPS
    print(f'{label}: {t*1e3:.3f} ms', flush=True)
    return t


def main():
    rs = np.random.RandomState(0)
    # (label, spatial, cin, cout, stride)
    cases = [
        ('trunk l2l 192p 128->128 s1', 192, 128, 128, 1),
        ('trunk l2g 192p 128->384 s1', 192, 128, 384, 1),
        ('trunk g2l 192p 384->128 s1', 192, 384, 128, 1),
        ('down2 1536p 64->128 s2', 1536, 64, 128, 2),
        ('down3 768p 128->256 s2', 768, 128, 256, 2),
        ('down4 384p 256->512 s2', 384, 256, 512, 2),
    ]
    for label, s, ci, co, stride in cases:
        x = jnp.asarray(rs.rand(1, s, s, ci).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.01,
                        jnp.bfloat16)
        b = jnp.asarray(rs.rand(co).astype(np.float32), jnp.bfloat16)
        t_r = loop(lambda v, _w=w, _b=b, _s=stride: conv2d(
            v, _w, _b, stride=_s, padding=1, pad_mode='reflect'),
            f'{label} REFLECT', x)
        t_z = loop(lambda v, _w=w, _b=b, _s=stride: conv2d(
            v, _w, _b, stride=_s, padding=1),
            f'{label} ZERO   ', x)
        print(f'  -> reflect overhead {1e3*(t_r-t_z):+.3f} ms', flush=True)


if __name__ == '__main__':
    main()
