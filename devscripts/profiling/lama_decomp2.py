"""LaMa inpaint budget decomposition with the reliable harness (REPS-looped
fori inside ONE jit, min-over-calls minus call floor) — single-call timings
through the axon tunnel measure the network, not the TPU.

Accounts the 104 ms bench inpaint into: full fwd / blocks / spectral /
local convs / shell parts, so the remaining unexplained share is visible.
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

from manga_image_translator_tpu.models import lama
from manga_image_translator_tpu.models.lama import (
    P, _resnet_block, _spectral_transform, _ffc_bn_act)

PAGE = 1536
LAT = PAGE // 8
rs = np.random.RandomState(0)

params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                      n_blocks=18)


def timed(fn, *args, n=6, reps=8):
    @jax.jit
    def looped(*a):
        def body(i, carry):
            args_i, s = carry
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype),
                                  args_i)
            return (args_i, s + fn(*bumped))
        _, s = jax.lax.fori_loop(0, reps, body, (a, jnp.float32(0)))
        return s

    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    for _ in range(2):
        float(looped(*args)); float(tiny(z))
    ts, fs = [], []
    for _ in range(n):
        t0 = time.perf_counter(); float(looped(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0) / reps


def main():
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))

    def full(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x,
                                          mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()
    t_full = timed(full, img, mask, reps=4)
    print(f'full fwd (bench harness): {t_full*1e3:.1f} ms', flush=True)

    xl = jnp.asarray(rs.rand(1, LAT, LAT, 128).astype(np.float32),
                     jnp.bfloat16)
    xg = jnp.asarray(rs.rand(1, LAT, LAT, 384).astype(np.float32),
                     jnp.bfloat16)

    def blocks(a, b):
        p = P(params)
        for i in range(18):
            a, b = _resnet_block(p.scope(f'model.{5 + i}'), a, b)
        return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
    t_blocks = timed(blocks, xl, xg, reps=4)
    print(f'18 blocks: {t_blocks*1e3:.1f} ms', flush=True)

    def spectral36(b):
        p = P(params)
        for i in range(18):
            for cv in ('conv1', 'conv2'):
                b = _spectral_transform(
                    p.scope(f'model.{5 + i}.{cv}.ffc.convg2g'), b)
        return b.astype(jnp.float32).sum()
    t_sp = timed(spectral36, xg, reps=4)
    print(f'36 spectral transforms: {t_sp*1e3:.1f} ms', flush=True)

    def local36(a, b):
        p = P(params)
        for i in range(18):
            for cv in ('conv1', 'conv2'):
                sc = p.scope(f'model.{5 + i}.{cv}.ffc')
                ol = sc.conv('convl2l', a, padding=1, pad_mode='reflect') \
                    + sc.conv('convg2l', b, padding=1, pad_mode='reflect')
                og = sc.conv('convl2g', a, padding=1, pad_mode='reflect')
                a, b = ol, og + b
        return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
    t_loc = timed(local36, xl, xg, reps=4)
    print(f'36 FFC local conv trios: {t_loc*1e3:.1f} ms', flush=True)

    # shell = everything but blocks: full fwd with n_blocks=0 is a
    # different param tree, so measure via the 18-block full minus blocks
    print(f'=> shell+glue (full - blocks): '
          f'{(t_full - t_blocks)*1e3:.1f} ms', flush=True)
    print(f'=> block glue (blocks - spectral - local): '
          f'{(t_blocks - t_sp - t_loc)*1e3:.1f} ms', flush=True)

    # shell parts on their own
    x4 = jnp.asarray(rs.rand(1, PAGE + 6, PAGE + 6, 4).astype(np.float32),
                     jnp.bfloat16)

    def stem(x):
        p = P(params)
        a, b = _ffc_bn_act(p.scope('model.1'), x, None, 0, 0, padding=0)
        return a.astype(jnp.float32).sum()
    print(f'stem: {timed(stem, x4, reps=4)*1e3:.1f} ms', flush=True)

    x64 = jnp.asarray(rs.rand(1, PAGE, PAGE, 64).astype(np.float32),
                      jnp.bfloat16)

    def downs(x):
        p = P(params)
        a, b = _ffc_bn_act(p.scope('model.2'), x, None, 0, 0,
                           stride=2, padding=1)
        a, b = _ffc_bn_act(p.scope('model.3'), a, None, 0, 0,
                           stride=2, padding=1)
        a, b = _ffc_bn_act(p.scope('model.4'), a, None, 0,
                           lama.RESNET_RATIO, stride=2, padding=1)
        return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
    print(f'downs 2-4: {timed(downs, x64, reps=4)*1e3:.1f} ms', flush=True)

    def ups_final(a, b):
        p = P(params)
        x = jnp.concatenate([a, b], axis=-1)
        up0 = 5 + 18 + 1
        for i in range(lama.N_DOWN):
            base = up0 + i * 3
            x = p.conv_t(f'model.{base}', x, stride=2, padding=1,
                         kernel_size=3, output_padding=1)
            if f'model.{base + 1}.running_mean' in P(params):
                x = p.bn(f'model.{base + 1}', x)
            x = jax.nn.relu(x)
        x = lama._final_conv(p, f'model.{up0 + 3 * lama.N_DOWN + 1}', x)
        return x.astype(jnp.float32).sum()
    print(f'ups+final: {timed(ups_final, xl, xg, reps=4)*1e3:.1f} ms',
          flush=True)


if __name__ == '__main__':
    main()
