import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama

PAGE = 1536

def timed(fn, *args, n=5):
    for _ in range(2):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

rs = np.random.RandomState(0)
img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))

# full 18-block generator
params18 = lama.init_params(n_blocks=18, dtype=jnp.bfloat16)

@jax.jit
def run_full(img, mask):
    x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
    out = lama.lama_generator_forward(params18, x, mask.astype(jnp.bfloat16),
                                      n_blocks=18)
    return out.astype(jnp.float32).sum()

print('full 18:', timed(run_full, img, mask))

# shell only (stem + down + up, zero blocks)
@jax.jit
def run_shell(img, mask):
    x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
    out = lama.lama_generator_forward(params18, x, mask.astype(jnp.bfloat16),
                                      n_blocks=0)
    return out.astype(jnp.float32).sum()

try:
    print('shell (0 blocks):', timed(run_shell, img, mask))
except Exception as e:
    print('shell failed:', type(e).__name__, str(e)[:200])

# blocks only at latent res
from manga_image_translator_tpu.models.lama import _resnet_block, P
lat = PAGE // 8
xl = jnp.asarray(rs.rand(1, lat, lat, 128).astype(np.float32), jnp.bfloat16)
xg = jnp.asarray(rs.rand(1, lat, lat, 384).astype(np.float32), jnp.bfloat16)

@jax.jit
def run_blocks(xl, xg):
    p = P(params18)
    a, b = xl, xg
    for i in range(18):
        a, b = _resnet_block(p.scope(f'model.{5 + i}'), a, b)
    return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

print('18 blocks only:', timed(run_blocks, xl, xg))

# fourier unit alone (36 of them run in the full model)
from manga_image_translator_tpu.models.lama import _spectral_transform

@jax.jit
def run_spectral(xg):
    p = P(params18)
    out = xg
    for i in range(18):
        out = _spectral_transform(
            p.scope(f'model.{5 + i}.conv1.ffc.convg2g'), out)
    return out.astype(jnp.float32).sum()

print('18 spectral transforms:', timed(run_spectral, xg))

# local convs only: 18 blocks of the 3 reflect-pad 3x3 convs
from manga_image_translator_tpu.models.lama import _ffc

@jax.jit
def run_local(xl, xg):
    p = P(params18)
    a, b = xl, xg
    for i in range(18):
        sc = p.scope(f'model.{5 + i}.conv1.ffc')
        ol = sc.conv('convl2l', a, padding=1, pad_mode='reflect') \
            + sc.conv('convg2l', b, padding=1, pad_mode='reflect')
        og = sc.conv('convl2g', a, padding=1, pad_mode='reflect')
        a, b = ol, og + b[..., :384]
    return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

print('18x3 local 3x3 convs:', timed(run_local, xl, xg))

# same local convs with ZERO pad (is reflect the problem?)
@jax.jit
def run_local_zero(xl, xg):
    p = P(params18)
    a, b = xl, xg
    for i in range(18):
        sc = p.scope(f'model.{5 + i}.conv1.ffc')
        ol = sc.conv('convl2l', a, padding=1) \
            + sc.conv('convg2l', b, padding=1)
        og = sc.conv('convl2g', a, padding=1)
        a, b = ol, og + b[..., :384]
    return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

print('18x3 local 3x3 convs zero-pad:', timed(run_local_zero, xl, xg))
