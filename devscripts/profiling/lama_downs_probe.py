"""LaMa shell downs (12.1 ms measured vs ~1.3 ms roofline): which part?

Times each downsample stage in isolation (the production _ffc_bn_act
stride-2 path on folded params), then its bare stride-2 conv, then the
packed s2d cell-conv equivalent — on the real shapes @1536.
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

from manga_image_translator_tpu.models import lama
from manga_image_translator_tpu.models.lama import (
    NGF, P, _down_s2d, _ffc_bn_act, _s2d2, relu)
from manga_image_translator_tpu.models.functional import conv2d

REPS = 8


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
            out = fn(*bumped)
            return s + jax.tree.reduce(
                lambda acc, o: acc + o.astype(jnp.float32).sum(),
                out, jnp.float32(0))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    t = timed(looped, *xs) / REPS
    print(f'{label}: {t*1e3:.2f} ms', flush=True)
    return t


def main():
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    p = P(params)
    rs = np.random.RandomState(0)
    shapes = [('model.2', 1536, NGF), ('model.3', 768, 2 * NGF)]
    for name, s, ci in shapes:
        x = jnp.asarray(rs.rand(1, s, s, ci).astype(np.float32),
                        jnp.bfloat16)
        sc = p.scope(name)
        loop(lambda v, _n=name: _ffc_bn_act(p.scope(_n), v, None, 0, 0,
                                            stride=2, padding=1),
             f'{name} full stage @{s} {ci}ch', x)
        w = sc['ffc.convl2l.weight']
        b = sc['ffc.convl2l.bias'] if 'ffc.convl2l.bias' in sc else None
        loop(lambda v, _w=w, _b=b: conv2d(v, _w, _b, stride=2, padding=1),
             f'{name} bare conv s2', x)
        loop(lambda v, _w=w, _b=b: relu(conv2d(v, _w, _b, stride=2,
                                               padding=1)),
             f'{name} conv s2 + relu', x)
        loop(lambda v, _n=name, _ci=ci: _down_s2d(p.scope(_n), _s2d2(v),
                                                  _ci),
             f'{name} s2d packed', x)


if __name__ == '__main__':
    main()
