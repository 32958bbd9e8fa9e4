"""The LaMa final 7x7 conv 64->3 @1536 costs ~25 ms (N=3 starves the MXU
lanes). Which reformulation is fastest?"""
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

def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)

def make(fn):
    def factory(reps):
        @jax.jit
        def run(x0):
            def body(i, carry):
                x, s = carry
                y = fn(x + (s * 0).astype(x.dtype))
                return x, s + y.sum()
            _, s = jax.lax.fori_loop(0, reps, body, (x0, jnp.float32(0)))
            return s
        return run
    return factory

w3 = jnp.asarray(rs.randn(7, 7, 64, 3).astype(np.float32) * 0.02,
                 jnp.bfloat16)
w8 = jnp.concatenate([w3, jnp.zeros((7, 7, 64, 5), jnp.bfloat16)], axis=3)
w128 = jnp.concatenate([w3, jnp.zeros((7, 7, 64, 125), jnp.bfloat16)],
                       axis=3)

def pad_reflect(x):
    return jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')

diff_bench(make(lambda x: conv(pad_reflect(x), w3)), x0, 'N=3 (current)')
diff_bench(make(lambda x: conv(pad_reflect(x), w8)[..., :3]), x0,
           'N=8 zero-padded')
diff_bench(make(lambda x: conv(pad_reflect(x), w128)[..., :3]), x0,
           'N=128 zero-padded')

# space-to-depth output: compute the 4 stride-2 phases as N=12, reassemble
w12 = jnp.concatenate([
    w3, jnp.zeros((7, 7, 64, 1), jnp.bfloat16)], axis=3)  # pad to 4 per phase

def s2d_final(x):
    xp = pad_reflect(x)
    outs = []
    for dy in range(2):
        for dx in range(2):
            outs.append(conv(xp[:, dy:dy + PAGE + 5, dx:dx + PAGE + 5],
                             w3, stride=2))
    o = jnp.stack(outs, axis=3)            # (N, H/2, W/2, 4, 3)
    n, hh, ww, _, c = o.shape
    o = o.reshape(n, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return o.reshape(n, hh * 2, ww * 2, c)
diff_bench(make(s2d_final), x0, 'space-to-depth 4-phase stride2')

# fp32 input instead of bf16
x0f = x0.astype(jnp.float32)
w3f = w3.astype(jnp.float32)
diff_bench(make(lambda x: conv(pad_reflect(x), w3f)), x0f, 'N=3 fp32')
