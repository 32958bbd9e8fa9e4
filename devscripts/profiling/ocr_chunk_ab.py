"""A/B: full beam_decode chunk on TPU — XLA decode path vs Pallas kernel.

Usage: [MIT_TPU_OCR_PALLAS=0|1] python ocr_chunk_ab.py [max_len]
(run each mode in its own process: the jit cache keys on the env only at
trace time)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

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

    def run():
        # max_finished_hypos > beams_k: random weights would otherwise
        # hit END on step 1 and early-exit — force the full max_len run
        ret = ocr48.beam_decode(params, images, widths, beams_k=5,
                                max_len=MAX_LEN, max_finished_hypos=99)
        # force the computation with a scalar pull — block_until_ready on
        # tunnel-remote buffers returns before the compute finishes
        float(jnp.sum(ret['sequences']))
        return ret

    run()  # compile
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    mode = os.environ.get('MIT_TPU_OCR_PALLAS', 'auto')
    print(f'beam_decode N={N} W={W} max_len={MAX_LEN} '
          f'pallas={mode}: {min(ts)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
