"""Compile + time the Pallas bilateral kernel on the TPU vs the XLA roll
formulation."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.ops.bilateral import bilateral_filter
from manga_image_translator_tpu.ops.pallas_bilateral import (
    bilateral_filter_pallas)

PAGE = 1536

def timed(fn, *args, n=8):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

rs = np.random.RandomState(0)
page = jnp.asarray(rs.randint(0, 255, (PAGE, PAGE, 3), dtype=np.uint8))

@jax.jit
def run_pallas(p):
    return bilateral_filter_pallas(p, 17, 80.0, 80.0) \
        .astype(jnp.float32).sum()

@jax.jit
def run_xla(p):
    return bilateral_filter(p, 17, 80.0, 80.0).astype(jnp.float32).sum()

t0 = time.perf_counter()
v1 = float(run_pallas(page))
print(f'pallas first call (compile): {time.perf_counter()-t0:.1f} s')

# difference method: loop the op on device so the tunnel floor cancels
def diff_time(op, label):
    def make(reps):
        @jax.jit
        def run(p):
            def body(i, s):
                q = (p + (s * 0).astype(p.dtype))
                return s + op(q).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
        return run
    t1 = timed(make(1), page, n=6)
    t2 = timed(make(5), page, n=6)
    print(f'{label}: {(t2-t1)/4*1000:.2f} ms on-chip')

diff_time(lambda p: bilateral_filter_pallas(p, 17, 80.0, 80.0), 'pallas')
diff_time(lambda p: bilateral_filter(p, 17, 80.0, 80.0), 'xla')

# numerical agreement on-device
a = np.asarray(bilateral_filter_pallas(page, 17, 80.0, 80.0))
b = np.asarray(bilateral_filter(page, 17, 80.0, 80.0))
interior = (slice(16, -16), slice(16, -16))
diff = np.abs(a[interior].astype(int) - b[interior].astype(int))
print(f'interior max |pallas - xla| = {diff.max()}, mean = {diff.mean():.4f}')
