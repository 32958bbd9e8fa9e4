"""Phase-packed final conv: XLA pads conv output channels to 128 lanes, so
a 7x7 64->3 conv at stride 1 costs M*128*K. Packing SxS output phases into
channels (stride S, kernel (6+S)^2, 3*S^2 outputs) shrinks M by S^2 while N
stays under 128 -> ~S^2 less padded work. Verify numerics + time."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

PAGE = 1536

def timed(fn, *args, n=8):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

def diff_bench(factory, x0, label, n1=2, n2=6):
    t = (timed(factory(n2), x0) - timed(factory(n1), x0)) / (n2 - n1)
    print(f'{label}: {t*1000:.2f} ms')
    return t

rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.rand(1, PAGE, PAGE, 64).astype(np.float32),
                 jnp.bfloat16)
w3 = jnp.asarray(rs.randn(7, 7, 64, 3).astype(np.float32) * 0.02,
                 jnp.bfloat16)

def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)

def pad_reflect(x):
    return jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')

def phase_packed_weights(w, s):
    """(7,7,C,3) -> ((6+s),(6+s),C,3*s*s): channel (dy*s+dx)*3+o holds w
    shifted by (dy,dx)."""
    kh, kw, c, o = w.shape
    out = np.zeros((kh + s - 1, kw + s - 1, c, o * s * s), np.float32)
    wnp = np.asarray(w, np.float32)
    for dy in range(s):
        for dx in range(s):
            out[dy:dy + kh, dx:dx + kw, :, (dy * s + dx) * o:(dy * s + dx + 1) * o] = wnp
    return jnp.asarray(out, w.dtype)

def depth_to_space(o, s, c):
    n, hh, ww, _ = o.shape
    o = o.reshape(n, hh, ww, s, s, c)
    o = o.transpose(0, 1, 3, 2, 4, 5)
    return o.reshape(n, hh * s, ww * s, c)

def make(fn):
    def factory(reps):
        @jax.jit
        def run(x0):
            def body(i, carry):
                x, st = carry
                y = fn(x + (st * 0).astype(x.dtype))
                return x, st + y.sum()
            _, st = jax.lax.fori_loop(0, reps, body, (x0, jnp.float32(0)))
            return st
        return run
    return factory

# correctness first (small image, CPU-precision comparison on TPU is fine
# since both paths use identical bf16 inputs/weights)
ref = conv(pad_reflect(x0), w3)
for s in (2, 4):
    wp = phase_packed_weights(w3, s)
    out = depth_to_space(conv(pad_reflect(x0), wp, stride=s), s, 3)
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f'phase s={s}: max|diff| = {err}')

diff_bench(make(lambda x: conv(pad_reflect(x), w3)), x0, 'stride1 N=3')
for s in (2, 4):
    wp = phase_packed_weights(w3, s)
    diff_bench(make(lambda x, wp=wp, s=s: depth_to_space(
        conv(pad_reflect(x), wp, stride=s), s, 3)), x0,
        f'phase-packed s={s} (N={3 * s * s})')
