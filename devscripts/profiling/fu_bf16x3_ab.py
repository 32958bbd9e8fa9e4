"""A/B the round-3 bf16x3 split-matmul Pallas FourierUnit vs the XLA
split path on the real chip, at LaMa-trunk shape (192²×192), amortized
on-chip (REPS-loop with serializing dependency, min-over-calls)."""
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
from manga_image_translator_tpu.models.lama import P

H = W = 192
C = 192
REPS = 32


def timed_min(fn, *args, n=6):
    for _ in range(2):
        float(fn(*args).sum())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def floor_time():
    z = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tiny(z):
        return z.sum()

    for _ in range(2):
        float(tiny(z))
    best = 1e9
    for _ in range(8):
        t0 = time.perf_counter()
        float(tiny(z))
        best = min(best, time.perf_counter() - t0)
    return best


rs = np.random.RandomState(0)
params = {
    'conv_layer.weight': jnp.asarray(
        rs.randn(1, 1, 2 * C, 2 * C).astype(np.float32) * 0.05),
    'conv_layer.bias': jnp.asarray(
        rs.randn(2 * C).astype(np.float32) * 0.01),
    'bn.running_mean': jnp.asarray(
        rs.randn(2 * C).astype(np.float32) * 0.05),
    'bn.running_var': jnp.asarray(rs.rand(2 * C).astype(np.float32) + 0.5),
    'bn.weight': jnp.asarray(rs.rand(2 * C).astype(np.float32) + 0.5),
    'bn.bias': jnp.asarray(rs.randn(2 * C).astype(np.float32) * 0.05),
}
x0 = jnp.asarray(rs.rand(1, H, W, C).astype(np.float32), jnp.bfloat16)

FLOOR = floor_time()
print(f'call floor: {FLOOR*1000:.1f} ms', flush=True)


def run_mode(mode):
    os.environ['MIT_TPU_LAMA_FU'] = mode

    @jax.jit
    def loop(x):
        def body(_, x):
            y = lama._fourier_unit(P(params), x)
            return (y * 0.98).astype(x.dtype)
        return jax.lax.fori_loop(0, REPS, body, x)

    t = timed_min(loop, x0)
    per = (t - FLOOR) / REPS * 1000
    print(f'{mode:8s}: {per:.3f} ms/FU  ({per*36:.1f} ms per 36-FU trunk)',
          flush=True)
    ref = lama._fourier_unit(P(params), x0.astype(jnp.float32))
    os.environ['MIT_TPU_LAMA_FU'] = 'xla'
    base = lama._fourier_unit(P(params), x0.astype(jnp.float32))
    err = float(jnp.abs(ref - base).max() / jnp.abs(base).max())
    print(f'          rel err vs xla: {err:.2e}', flush=True)
    return per


xla = run_mode('xla')
p3 = run_mode('pallas3')
print(f'SPEEDUP pallas3 vs xla: {xla/p3:.2f}x', flush=True)
