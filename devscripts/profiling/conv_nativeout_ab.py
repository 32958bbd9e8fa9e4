"""A/B: conv preferred_element_type=f32 + astype(bf16) (default) vs native
bf16 conv output (MIT_TPU_CONV_NATIVE_OUT=1). If XLA does NOT fuse the
convert into the conv fusion, the default writes the f32 accumulator to HBM
(2x bytes) on every conv of every model. One process, interleaved."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama, ocr48
from manga_image_translator_tpu.models.lama import P, _resnet_block

PAGE = 1536
LAT = PAGE // 8
rs = np.random.RandomState(0)


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
    lp = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                      n_blocks=18)
    op = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in ocr48.init_params(dict_size=7935).items()}

    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))
    xl = jnp.asarray(rs.rand(1, LAT, LAT, 128).astype(np.float32),
                     jnp.bfloat16)
    xg = jnp.asarray(rs.rand(1, LAT, LAT, 384).astype(np.float32),
                     jnp.bfloat16)
    crops = jnp.asarray(rs.rand(32, 48, 256, 3).astype(np.float32) * 2 - 1,
                        jnp.bfloat16)

    def blocks(a, b):
        p = P(lp)
        for i in range(18):
            a, b = _resnet_block(p.scope(f'model.{5 + i}'), a, b)
        return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()

    def full(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(lp, x, mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()

    def backbone(x):
        return ocr48.convnext_features(
            ocr48.P(op).scope('backbone'), x).astype(jnp.float32).sum()

    # equality check (one pair of plain calls, full fwd)
    outs = {}
    for mode in ('0', '1'):
        os.environ['MIT_TPU_CONV_NATIVE_OUT'] = mode
        f = jax.jit(lambda i, m, _md=mode: lama.lama_generator_forward(
            lp, i.astype(jnp.bfloat16) * (1 - m.astype(jnp.bfloat16)),
            m.astype(jnp.bfloat16), n_blocks=18))
        outs[mode] = np.asarray(f(img, mask), np.float32)
    diff = float(np.max(np.abs(outs['0'] - outs['1'])))
    print(f'full fwd max |diff| f32-pref vs native: {diff:.3e}', flush=True)

    for label, fn, args in (
            ('blocks18', blocks, (xl, xg)),
            ('lama full', full, (img, mask)),
            ('ocr backbone', backbone, (crops,))):
        for mode in ('0', '1'):
            os.environ['MIT_TPU_CONV_NATIVE_OUT'] = mode
            t = timed(lambda *a, _m=mode, _f=fn: _f(*a), *args,
                      reps=(4 if label != 'ocr backbone' else 8))
            print(f'{label} native_out={mode}: {t*1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
