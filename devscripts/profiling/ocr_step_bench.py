"""OCR beam-decode timing after the stacked/fused step rewrite."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
os.environ.setdefault('MIT_TPU_OCR_MAX_LEN', '64')
from manga_image_translator_tpu.models import ocr48

def bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}

params = bf16(ocr48.init_params(dict_size=7935))
rs = np.random.RandomState(1)
crops = np.zeros((32, 48, 256, 3), np.uint8)
crops[:24] = rs.randint(0, 255, (24, 48, 256, 3), dtype=np.uint8)
crops = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
widths = np.zeros((32,), np.int32)
widths[:24] = [200 + (i % 5) * 10 for i in range(24)]
widths = jnp.asarray(widths)

def run(max_len):
    ret = ocr48.beam_decode(params, crops, widths, beams_k=5,
                            max_len=max_len)
    return float(ret['probs'].sum() + ret['sequences'].sum())

for ml in (64, 32):
    for _ in range(2):
        run(ml)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); run(ml)
        ts.append(time.perf_counter() - t0)
    print(f'beam_decode max_len={ml}: {min(ts)*1e3:.1f} ms')
# difference method: step cost = (t64 - t32) / 32
