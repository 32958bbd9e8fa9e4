#!/usr/bin/env python
"""A/B: OCR ConvNeXt backbone with BatchNorms folded into convs vs not.

r4 xprof: the backbone's ~30 conv fusions are Compute-bound with fused VPU
epilogues (dwconv+bn+gelu+residual) serializing against the MXU. Folding
BN removes one scale+shift per conv from each epilogue. Interleaved
one-process A/B (the graphs differ by param-key presence, so each arm
traces its own graph — no env-flag trace-time hazard).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48

REPS = 8
N_ITERS = 5


def bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def call_floor():
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def tiny(x):
        return x.sum()
    for _ in range(3):
        float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(x))
    return (time.perf_counter() - t0) / 10


def timed(stage_fn, *args, floor=0.0):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + stage_fn(*bumped)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    for _ in range(2):
        float(looped(*args))
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        float(looped(*args))
    return max((time.perf_counter() - t0) / N_ITERS - floor, 0.0) / REPS


def main():
    raw = ocr48.init_params(dict_size=7935)
    # randomize BN stats so the fold is non-trivial
    rs0 = np.random.RandomState(9)
    for k in list(raw):
        if k.endswith('.running_mean'):
            raw[k] = jnp.asarray(
                rs0.randn(*raw[k].shape).astype(np.float32) * 0.1)
        elif k.endswith('.running_var'):
            raw[k] = jnp.asarray(
                1.0 + 0.5 * rs0.rand(*raw[k].shape).astype(np.float32))
    arm_unfolded = bf16(raw)
    arm_folded = bf16(ocr48.fold_bn(raw))
    floor = call_floor()
    print(f'call floor {floor * 1000:.1f} ms', flush=True)

    rs = np.random.RandomState(1)
    c = jnp.asarray(rs.randint(0, 255, (24, 48, 256, 3)),
                    jnp.float32) / 127.5 - 1.0
    w = jnp.asarray([200 + (i % 5) * 10 for i in range(24)], jnp.int32)

    def mem_run(params):
        def fn(c, w):
            mem, _ = ocr48.compute_memory(params, c, w)
            return mem.astype(jnp.float32).sum()
        return fn

    for _pass in range(2):
        for name, params in (('unfolded', arm_unfolded),
                             ('folded  ', arm_folded)):
            t = timed(mem_run(params), c, w, floor=floor)
            print(f'memory 24-crop {name}: {t * 1000:6.2f} ms', flush=True)

    # sanity: same features within bf16 noise
    m0, _ = ocr48.compute_memory(arm_unfolded, c, w)
    m1, _ = ocr48.compute_memory(arm_folded, c, w)
    d = float(jnp.max(jnp.abs(m0.astype(jnp.float32)
                              - m1.astype(jnp.float32))))
    print(f'max|unfolded - folded| = {d:.4f} (bf16 params)', flush=True)


if __name__ == '__main__':
    main()
