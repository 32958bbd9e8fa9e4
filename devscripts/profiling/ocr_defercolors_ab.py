"""A/B: per-step color-cache gather + latch (eager) vs deferred row_src
parent-chain reconstruction after the loop. One process, interleaved."""
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
        os.environ['MIT_TPU_OCR_DEFER_COLORS'] = mode
        fn = jax.jit(lambda p, im, w, _m=mode: inner(
            p, im, w, beams_k=5, max_len=MAX_LEN, max_finished_hypos=99))
        t0 = time.perf_counter()
        ret = fn(params, images, widths)
        s = float(jnp.sum(ret['sequences']))
        print(f'mode {mode}: compile+first {time.perf_counter()-t0:.1f}s '
              f'(seqsum {s:.0f})', flush=True)
        runs[mode] = fn

    r0 = runs['0'](params, images, widths)
    r1 = runs['1'](params, images, widths)
    same_seq = np.array_equal(np.asarray(r0['sequences']),
                              np.asarray(r1['sequences']))
    same_fg = np.array_equal(np.asarray(r0['fg']), np.asarray(r1['fg']))
    print(f'sequences identical: {same_seq}  fg identical: {same_fg}',
          flush=True)

    times = {'0': [], '1': []}
    for _ in range(8):
        for mode, fn in runs.items():
            t0 = time.perf_counter()
            float(jnp.sum(fn(params, images, widths)['sequences']))
            times[mode].append(time.perf_counter() - t0)
    for mode in ('0', '1'):
        print(f'beam_decode N={N} W={W} max_len={MAX_LEN} '
              f'defer_colors={mode}: {min(times[mode])*1e3:.1f} ms')


if __name__ == '__main__':
    main()
