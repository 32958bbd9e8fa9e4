"""Which part of the spectral transform costs 40 ms: DFT matmuls, fp32
precision, or the surrounding 1x1 convs? Full-block context, loop harness."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama
from manga_image_translator_tpu.models.lama import (
    P, _rfft2_matmul, _irfft2_matmul, relu, _ffc_bn_act, RESNET_RATIO)

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
p = P(params)

def fu_variant(kind):
    def fu(fp, x):
        n, h, w, c = x.shape
        if kind == 'identity':
            y = jnp.concatenate([x, x], axis=-1)[:, :, :w // 2 + 1, :]
            y = fp.conv('conv_layer', y)
            y = relu(fp.bn('bn', y))
            return jnp.pad(y[..., :c], ((0, 0), (0, 0), (0, w - w // 2 - 1),
                                        (0, 0)))
        if kind == 'bf16':
            re, im = _rfft2_matmul_bf16(x)
        else:
            re, im = _rfft2_matmul(x.astype(jnp.float32))
        stacked = jnp.stack([re, im], axis=-1).reshape(n, h, w // 2 + 1,
                                                       2 * c)
        y = fp.conv('conv_layer', stacked.astype(x.dtype))
        y = relu(fp.bn('bn', y))
        y = y.astype(jnp.float32).reshape(n, h, w // 2 + 1, c, 2)
        if kind == 'bf16':
            out = _irfft2_matmul_bf16(y[..., 0], y[..., 1], h, w)
        else:
            out = _irfft2_matmul(y[..., 0], y[..., 1], h, w)
        return out.astype(x.dtype)
    return fu

def _rfft2_matmul_bf16(x):
    from manga_image_translator_tpu.models.lama import _dft_mats_joint
    n, h, w, c = x.shape
    fwd_w, fwd_h, _, _, k, norm = _dft_mats_joint(h, w)
    xb = x.astype(jnp.bfloat16)
    f = jnp.einsum('nhwc,wk->nhkc', xb, fwd_w.astype(np.float32),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    stacked = jnp.concatenate([f[:, :, :k], f[:, :, k:]], axis=1)
    out = jnp.einsum('nhkc,hj->njkc', stacked, fwd_h.astype(np.float32),
                     preferred_element_type=jnp.float32) * norm
    return out[:, :h], out[:, h:]

def _irfft2_matmul_bf16(re, im, h, w):
    from manga_image_translator_tpu.models.lama import _dft_mats_joint
    _, _, inv_h, inv_w, k, norm = _dft_mats_joint(h, w)
    stacked = jnp.concatenate([re, im], axis=1).astype(jnp.bfloat16)
    g = jnp.einsum('njkc,jh->nhkc', stacked, inv_h.astype(np.float32),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    joined = jnp.concatenate([g[:, :h], g[:, h:]], axis=2)
    return jnp.einsum('nhkc,kw->nhwc', joined, inv_w.astype(np.float32),
                      preferred_element_type=jnp.float32) * norm

def blocks_with_fu(fu):
    def run(a, b):
        for i in range(18):
            for conv in ('conv1', 'conv2'):
                sc = p.scope(f'model.{5 + i}.{conv}')
                fc = sc.scope('ffc')
                ol = fc.conv('convl2l', a, padding=1, pad_mode='reflect') \
                    + fc.conv('convg2l', b, padding=1, pad_mode='reflect')
                sp = fc.scope('convg2g')
                z = relu(sp.bn('conv1.1', sp.conv('conv1.0', b)))
                z = sp.conv('conv2', z + fu(sp.scope('fu'), z))
                og = fc.conv('convl2g', a, padding=1, pad_mode='reflect') + z
                a = relu(sc.bn('bn_l', ol))
                b = relu(sc.bn('bn_g', og))
        return a, b
    return run

def bench(fn, label):
    @jax.jit
    def looped(xl, xg):
        def body(i, carry):
            a, b, s = carry
            a, b = fn(a, b)
            return (a, b, s + a.astype(jnp.float32).sum()
                    + b.astype(jnp.float32).sum())
        _, _, s = jax.lax.fori_loop(0, REPS, body,
                                    (xl, xg, jnp.float32(0)))
        return s
    t = (timed(looped, xl0, xg0) - FLOOR) / REPS
    print(f'{label}: {t*1000:.2f} ms per 18-block pass')
    return t

bench(blocks_with_fu(fu_variant('fp32')), 'FU fp32 joint DFT (current)')
bench(blocks_with_fu(fu_variant('bf16')), 'FU bf16 DFT')
bench(blocks_with_fu(fu_variant('identity')), 'FU identity (no DFT)')
