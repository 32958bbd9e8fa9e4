"""A/B: OCR decode with XLA char-head epilogue vs the fused top-k Pallas
kernel, both traced in ONE process (the tunnel recompiles per process).

MIT_TPU_OCR_KERNEL_TOPK is read at trace time inside beam_decode's
harness; beam_decode itself is module-jitted so each mode goes through
its own outer jit wrapper over the unjitted function.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from manga_image_translator_tpu.models import ocr48

N = 16
W = 192
MAX_LEN = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in ocr48.init_params(dict_size=7935).items()}
    params = ocr48.fuse_qkv_params(params)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(N, 48, W, 3).astype(np.float32) * 2 - 1)
    widths = jnp.asarray([W] * N, np.int32)
    inner = ocr48.beam_decode.__wrapped__

    runs = {}
    for mode in ('0', '1'):
        os.environ['MIT_TPU_OCR_KERNEL_TOPK'] = mode
        fn = jax.jit(lambda p, im, w, _m=mode: inner(
            p, im, w, beams_k=5, max_len=MAX_LEN, max_finished_hypos=99))
        t0 = time.perf_counter()
        float(jnp.sum(fn(params, images, widths)['sequences']))
        print(f'mode {mode}: compile+first {time.perf_counter()-t0:.1f}s',
              flush=True)
        runs[mode] = fn

    times = {'0': [], '1': []}
    for _ in range(8):
        for mode, fn in runs.items():
            t0 = time.perf_counter()
            float(jnp.sum(fn(params, images, widths)['sequences']))
            times[mode].append(time.perf_counter() - t0)
    for mode in ('0', '1'):
        print(f'beam_decode N={N} W={W} max_len={MAX_LEN} topk={mode}: '
              f'{min(times[mode])*1e3:.1f} ms')


if __name__ == '__main__':
    main()
