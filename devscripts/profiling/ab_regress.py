"""A/B the r2 OCR/LaMa changes with the on-chip REPS harness.

Usage: ab_regress.py {ocr|inpaint} [flags...] — separate processes per
variant (env flags freeze at trace time).
  ocr:      MIT_TPU_OCR_FUSED=0|1
  inpaint:  MIT_TPU_LAMA_PALLAS=0|1  MIT_TPU_LAMA_FOLD=0|1
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
os.environ.setdefault('MIT_TPU_OCR_MAX_LEN', '64')

REPS = 8


def timed(fn, *args, n=5):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + fn(*bumped)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

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
    return max(min(ts) - min(fs), 0.0) / REPS


def bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def main():
    mode = sys.argv[1]
    if mode == 'ocr':
        from manga_image_translator_tpu.models import ocr48
        params = bf16(ocr48.init_params(dict_size=7935))
        rs = np.random.RandomState(1)
        crops = np.zeros((32, 48, 256, 3), np.uint8)
        crops[:24] = rs.randint(0, 255, (24, 48, 256, 3), dtype=np.uint8)
        crops = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
        widths = np.zeros((32,), np.int32)
        widths[:24] = [200 + (i % 5) * 10 for i in range(24)]
        widths = jnp.asarray(widths)

        def run(crops, widths):
            ret = ocr48.beam_decode(params, crops, widths, beams_k=5,
                                    max_len=64)
            return (ret['probs'].sum()
                    + ret['sequences'].astype(jnp.float32).sum())
        t = timed(run, crops, widths)
        print(f"ocr fused={os.environ.get('MIT_TPU_OCR_FUSED','1')}: "
              f"{t*1e3:.1f} ms")
    else:
        from manga_image_translator_tpu.models import lama
        params = lama.init_params(n_blocks=18, dtype=jnp.bfloat16)
        if os.environ.get('MIT_TPU_LAMA_FOLD', '1') != '0':
            params = lama.fold_bn(params, 18)
        rs = np.random.RandomState(2)
        img = jnp.asarray(rs.rand(1, 1536, 1536, 3).astype(np.float32))
        mask = jnp.asarray((rs.rand(1, 1536, 1536, 1) < 0.1)
                           .astype(np.float32))

        def run(img, mask):
            x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
            out = lama.lama_generator_forward(params, x,
                                              mask.astype(jnp.bfloat16),
                                              n_blocks=18)
            return (out.astype(jnp.float32) * mask
                    + img * (1 - mask)).sum()
        t = timed(run, img, mask)
        print(f"inpaint pallas={os.environ.get('MIT_TPU_LAMA_PALLAS','1')} "
              f"fold={os.environ.get('MIT_TPU_LAMA_FOLD','1')}: "
              f"{t*1e3:.1f} ms")


if __name__ == '__main__':
    main()
