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

# tiny matmuls (256^3 = 33 MFLOP, ~0.002 ms compute each) chained so they
# cannot fuse — if each still costs ~0.6 ms, per-kernel overhead confirmed
m = jnp.asarray(rs.rand(256, 256).astype(np.float32), jnp.bfloat16)
w = jnp.asarray(rs.rand(256, 256).astype(np.float32), jnp.bfloat16)

def chain(k):
    @jax.jit
    def f(m, w):
        y = m
        for _ in range(k):
            y = jnp.dot(y, w, preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16) * jnp.bfloat16(1e-2)
        return y.astype(jnp.float32).sum()
    return f

t1 = timed(chain(1), m, w)
t64 = timed(chain(64), m, w)
t256 = timed(chain(256), m, w)
print(f'1 tiny matmul: {t1*1000:.2f} ms')
print(f'64 tiny matmuls: {t64*1000:.2f} ms -> {(t64-t1)/63*1000:.3f} ms/kernel')
print(f'256 tiny matmuls: {t256*1000:.2f} ms -> {(t256-t1)/255*1000:.3f} ms/kernel')

# same with fori_loop (one kernel looped on device)
@jax.jit
def fori256(m, w):
    def body(i, y):
        return (jnp.dot(y, w, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16) * jnp.bfloat16(1e-2))
    return jax.lax.fori_loop(0, 256, body, m).astype(jnp.float32).sum()

tf = timed(fori256, m, w)
print(f'fori_loop 256 tiny matmuls: {tf*1000:.2f} ms '
      f'-> {(tf-t1)/255*1000:.3f} ms/iter')
