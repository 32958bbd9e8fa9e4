"""On-chip decomposition of the LaMa resnet-block cost (loop harness)."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama
from manga_image_translator_tpu.models.lama import (
    P, _resnet_block, _spectral_transform, _ffc_bn_act, RESNET_RATIO)

H = W = 192
REPS = 8

def timed(fn, *args, n=8):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

def floor_time():
    z = jnp.zeros((8, 128), jnp.float32)
    @jax.jit
    def tiny(z):
        return z.sum()
    return timed(tiny, z)

FLOOR = floor_time()
print(f'call floor: {FLOOR*1000:.1f} ms')

params = lama.init_params(n_blocks=18, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
xl0 = jnp.asarray(rs.rand(1, H, W, 128).astype(np.float32), jnp.bfloat16)
xg0 = jnp.asarray(rs.rand(1, H, W, 384).astype(np.float32), jnp.bfloat16)

def loop18(fn, label):
    @jax.jit
    def looped(xl, xg):
        def body(i, carry):
            a, b, s = carry
            a, b = fn(a, b)
            return (a, b, s + a.astype(jnp.float32).sum())
        _, _, s = jax.lax.fori_loop(0, REPS, body,
                                    (xl, xg, jnp.float32(0)))
        return s
    t = (timed(looped, xl0, xg0) - FLOOR) / REPS
    print(f'{label}: {t*1000:.3f} ms per 18-block pass')
    return t

p = P(params)

def blocks_full(a, b):
    for i in range(18):
        a, b = _resnet_block(p.scope(f'model.{5 + i}'), a, b)
    return a, b

def blocks_no_spectral(a, b):
    # same structure with the spectral transform replaced by identity
    for i in range(18):
        for conv in ('conv1', 'conv2'):
            sc = p.scope(f'model.{5 + i}.{conv}')
            fc = sc.scope('ffc')
            ol = fc.conv('convl2l', a, padding=1, pad_mode='reflect') \
                + fc.conv('convg2l', b, padding=1, pad_mode='reflect')
            og = fc.conv('convl2g', a, padding=1, pad_mode='reflect') + b
            a = jax.nn.relu(sc.bn('bn_l', ol))
            b = jax.nn.relu(sc.bn('bn_g', og))
    return a, b

def blocks_convs_only(a, b):
    # convs without BN/relu/residual
    for i in range(18):
        for conv in ('conv1', 'conv2'):
            fc = p.scope(f'model.{5 + i}.{conv}.ffc')
            ol = fc.conv('convl2l', a, padding=1, pad_mode='reflect') \
                + fc.conv('convg2l', b, padding=1, pad_mode='reflect')
            og = fc.conv('convl2g', a, padding=1, pad_mode='reflect') + b
            a, b = ol, og
    return a, b

def spectral_only(a, b):
    for i in range(18):
        for conv in ('conv1', 'conv2'):
            b = _spectral_transform(
                p.scope(f'model.{5 + i}.{conv}.ffc.convg2g'), b) \
                + b * jnp.bfloat16(0.01)
    return a, b

t_full = loop18(blocks_full, 'full blocks (36 FFC)')
t_nospec = loop18(blocks_no_spectral, 'no-spectral blocks')
t_convs = loop18(blocks_convs_only, 'convs only (no bn/relu)')
t_spec = loop18(spectral_only, '36 spectral transforms only')
print(f'=> spectral share: {(t_full-t_nospec)*1000:.2f} ms; '
      f'bn/relu share: {(t_nospec-t_convs)*1000:.2f} ms; '
      f'convs: {t_convs*1000:.2f} ms')
