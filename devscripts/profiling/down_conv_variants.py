"""LaMa model.2 downsample (3x3 s2, 64->128ch @1536) runs ~8x off its
HBM bandwidth floor (4.68 ms measured vs ~0.55 ms for 453 MB of traffic).
Try alternative XLA formulations:

  v0: conv2d stride 2 (current)
  v1: stride-1 conv + [::2,::2] slice (4x FLOPs, friendlier conv config)
  v2: f32 input (layout/lane-packing probe)
  v3: input channels zero-padded 64->128 (lane packing probe)
  v4: row-phase split (even/odd rows, k=1/k=2 kernels, stride (1,2))
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

REPS = 16
_DN = ('NHWC', 'HWIO', 'NHWC')


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, pad, dimension_numbers=_DN,
        preferred_element_type=jnp.float32).astype(x.dtype)


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
    print(f'{label}: {t*1e3:.2f} ms', flush=True)
    return t


def main():
    rs = np.random.RandomState(0)
    S, CI, CO = 1536, 64, 128
    x = jnp.asarray(rs.rand(1, S, S, CI).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rs.rand(3, 3, CI, CO).astype(np.float32) * 0.05,
                    jnp.bfloat16)

    def v0(x, w):
        return conv(x, w, (2, 2), [(1, 1), (1, 1)])

    def v1(x, w):
        return conv(x, w, (1, 1), [(1, 1), (1, 1)])[:, ::2, ::2]

    def v2(x, w):
        return conv(x.astype(jnp.float32), w.astype(jnp.float32),
                    (2, 2), [(1, 1), (1, 1)]).astype(jnp.bfloat16)

    def v3(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, CI)))
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, CI), (0, 0)))
        return conv(xp, wp, (2, 2), [(1, 1), (1, 1)])

    def v4(x, w):
        xe = x[:, 0::2]            # rows 0,2,..  (768, 1536)
        xo = x[:, 1::2]            # rows 1,3,..
        # y[r] = w0·x[2r-1] + w1·x[2r] + w2·x[2r+1]
        #      = [w0,w2] k=2 conv over xo (pad top 1) + w1 k=1 conv over xe
        w_mid = w[1:2]                       # (1,3,CI,CO)
        w_odd = jnp.stack([w[0], w[2]], 0)   # (2,3,CI,CO)
        ye = conv(xe, w_mid, (1, 2), [(0, 0), (1, 1)])
        yo = conv(xo, w_odd, (1, 2), [(1, 0), (1, 1)])
        return ye + yo

    ref = np.asarray(v0(x, w), np.float32)
    for name, fn in [('v1', v1), ('v2', v2), ('v3', v3), ('v4', v4)]:
        out = np.asarray(fn(x, w), np.float32)
        err = np.abs(out[:, :768, :768, :CO] if name == 'v3'
                     else out).max() if out.shape != ref.shape else \
            np.abs(out - ref).max()
        if out.shape == ref.shape:
            print(f'{name} max|diff| vs v0: {np.abs(out-ref).max():.3e}',
                  flush=True)
        elif name == 'v3':
            print(f'v3 max|diff| vs v0: '
                  f'{np.abs(out[..., :CO] - ref).max():.3e}', flush=True)

    loop(v0, 'v0 s2 conv      ', x, w)
    loop(v1, 'v1 s1 conv+slice', x, w)
    loop(v2, 'v2 f32 s2 conv  ', x, w)
    loop(v3, 'v3 ch-padded s2 ', x, w)
    loop(v4, 'v4 row-phase    ', x, w)
    loop(v0, 'v0 s2 conv   (2)', x, w)


if __name__ == '__main__':
    main()
