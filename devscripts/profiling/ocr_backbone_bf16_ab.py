"""A/B the 48px OCR ConvNeXt backbone with f32 vs bf16 activations.

The production path feeds f32 crops (ocr/model_48px.py:219) so every conv
upcasts its bf16 weights to f32 — doubling HBM activation traffic and
halving the MXU rate on a backbone the r4 xprof already showed at 6-19%
MXU utilization. If bf16 activations win, compute_memory casts at entry
(the decode side is already bf16 end-to-end: caches, fused kernel).

Also measures the encoder (3 xpos self-attention layers) separately.
"""
import os
import sys
import time

os.environ['MIT_TPU_OCR_BF16_BACKBONE'] = '0'   # arms cast manually
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.models.ocr48 import P

N = 24
REPS = 30
VOCAB = 7935

params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in ocr48.fold_bn(ocr48.init_params(dict_size=VOCAB)).items()}
rs = np.random.RandomState(0)
crops_f32 = jnp.asarray(rs.rand(N, 48, 256, 3).astype(np.float32) * 2 - 1)
widths = jnp.asarray(np.full((N,), 230, np.int32))


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / REPS)
    return min(ts)


@jax.jit
def backbone_f32(x):
    return ocr48.convnext_features(P(params).scope('backbone'), x)


@jax.jit
def backbone_bf16(x):
    return ocr48.convnext_features(P(params).scope('backbone'),
                                   x.astype(jnp.bfloat16))


@jax.jit
def memory_f32(x, w):
    return ocr48.compute_memory(params, x, w)[0]


@jax.jit
def memory_bf16(x, w):
    return ocr48.compute_memory(params, x.astype(jnp.bfloat16), w)[0]


if __name__ == '__main__':
    print(f'backend={jax.default_backend()} n={N}')
    tb32 = timed(backbone_f32, crops_f32)
    tb16 = timed(backbone_bf16, crops_f32)
    print(f'backbone only : f32 {tb32*1e3:7.2f} ms   bf16 {tb16*1e3:7.2f} ms')
    tm32 = timed(memory_f32, crops_f32, widths)
    tm16 = timed(memory_bf16, crops_f32, widths)
    print(f'full memory   : f32 {tm32*1e3:7.2f} ms   bf16 {tm16*1e3:7.2f} ms')
    # numeric drift of the memory tokens (decides parity risk)
    m32 = np.asarray(memory_f32(crops_f32, widths), np.float32)
    m16 = np.asarray(memory_bf16(crops_f32, widths), np.float32)
    denom = np.abs(m32).mean()
    print(f'memory drift: max|d|={np.abs(m32-m16).max():.4f} '
          f'mean|d|={np.abs(m32-m16).mean():.5f} mean|m|={denom:.4f}')
