"""Bound the win available from a lazy composed-permutation decode scheme.

Arms (one subprocess each — MIT_TPU_OCR_PERM_DEBUG is read at module
import, and the eager-trace rule from NOTES applies):
  default  — fused-gather kernel as shipped (permute + write-back)
  nowb     — permute matmuls kept, KV write-back dropped (traffic model of
             the lazy scheme minus its one-hot construction; sequences
             WRONG, timing-only)
  skip     — no permute, no write-back (absolute floor for any
             permutation scheme; sequences WRONG, timing-only)

If default ≈ skip, the permute+write-back is already free (hidden behind
weight/FF DMAs) and a lazy-perm redesign is pointless. If nowb ≈ skip
<< default, the write-back is the cost and the redesign pays.
"""
import os
import subprocess
import sys

ARMS = ['', 'nowb', 'skip']

INNER = r'''
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from manga_image_translator_tpu.models import ocr48

params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in ocr48.init_params(dict_size=7935).items()}
rs = np.random.RandomState(1)
crops = np.zeros((32, 48, 256, 3), np.uint8)
crops[:24] = rs.randint(0, 255, (24, 48, 256, 3), dtype=np.uint8)
crops = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
widths = np.zeros((32,), np.int32); widths[:24] = 200
widths = jnp.asarray(widths)

def timed(max_len, n=6):
    @jax.jit
    def run(crops, widths):
        ret = ocr48.beam_decode(params, crops, widths, beams_k=5,
                                max_len=max_len)
        return (ret['probs'].sum()
                + ret['sequences'].astype(jnp.float32).sum())
    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    for _ in range(2):
        float(run(crops, widths)); float(tiny(z))
    ts, fs = [], []
    for _ in range(n):
        t0 = time.perf_counter(); float(run(crops, widths))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0)

arm = os.environ.get('MIT_TPU_OCR_PERM_DEBUG', '') or 'default'
t64 = timed(64)
t255 = timed(255)
print(f'ARM {arm}: 64-step {t64*1e3:.1f} ms  255-step {t255*1e3:.1f} ms',
      flush=True)
'''


def main():
    for arm in ARMS:
        env = dict(os.environ)
        if arm:
            env['MIT_TPU_OCR_PERM_DEBUG'] = arm
        else:
            env.pop('MIT_TPU_OCR_PERM_DEBUG', None)
        r = subprocess.run([sys.executable, '-c', INNER], env=env)
        if r.returncode != 0:
            print(f'arm {arm or "default"} FAILED rc={r.returncode}')


if __name__ == '__main__':
    main()
