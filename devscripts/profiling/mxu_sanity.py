import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

def timed(fn, *args, n=10):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

rs = np.random.RandomState(0)
print('device:', jax.devices()[0])

# big matmul: 8192^3 = 1.1 TFLOP
a = jnp.asarray(rs.rand(8192, 8192).astype(np.float32), jnp.bfloat16)
b = jnp.asarray(rs.rand(8192, 8192).astype(np.float32), jnp.bfloat16)

@jax.jit
def big(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).sum()

t = timed(big, a, b)
print(f'big matmul 8192^3: {t*1000:.2f} ms = {1.1/t:.0f} TFLOP/s')

# chained small matmuls like the FU conv: (18624, 384) @ (384, 384) x 16
m = jnp.asarray(rs.rand(18624, 384).astype(np.float32), jnp.bfloat16)
w = jnp.asarray(rs.rand(384, 384).astype(np.float32), jnp.bfloat16)

@jax.jit
def small16(m, w):
    y = m
    for _ in range(16):
        y = jnp.dot(y, w, preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16) * jnp.bfloat16(1e-2)
    return y.astype(jnp.float32).sum()

t = timed(small16, m, w)
fl = 16 * 2 * 18624 * 384 * 384
print(f'16x small matmul (18624,384)@(384,384): {t*1000/16:.3f} ms each '
      f'= {fl/t/1e12:.1f} TFLOP/s')

# single small matmul — measures per-execution overhead
@jax.jit
def small1(m, w):
    return jnp.dot(m, w, preferred_element_type=jnp.float32).sum()

t = timed(small1, m, w)
print(f'1x small matmul: {t*1000:.3f} ms')

# empty-ish program — pure execution/tunnel overhead
@jax.jit
def tiny(m):
    return m[0, :8].sum()

t = timed(tiny, m)
print(f'tiny program: {t*1000:.3f} ms (per-call overhead floor)')
