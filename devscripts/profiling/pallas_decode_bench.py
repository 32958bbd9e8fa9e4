"""Fused Pallas decoder step vs the XLA decode_step, on-chip loop."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.ops import pallas_decode as pd

N, S, M = 80, 256, 64
STEPS = 256


def bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def timed(fn, *args, n=5):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(fn(*args))
        ts.append(time.perf_counter() - t0)

    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    fs = []
    for _ in range(5):
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0)


def main():
    params = bf16(ocr48.init_params(dict_size=7935))
    rs = np.random.RandomState(0)
    memory = jnp.asarray(rs.randn(N, M, pd.E).astype(np.float32) * .5,
                         jnp.bfloat16)
    memory_mask = jnp.zeros((N, M), bool)
    ref_caches = ocr48.init_caches(params, memory, N, S)
    xpos_tables = ocr48.xpos_step_tables(S)

    # --- XLA decode_step loop ---
    @jax.jit
    def run_ref(memory):
        caches = ocr48.init_caches(params, memory, N, S)

        def body(step, carry):
            caches, s = carry
            tok = jnp.full((N,), 5, jnp.int32)
            out, caches = ocr48.decode_step(params, caches, tok, step,
                                            memory_mask, xpos_tables)
            return caches, s + out.astype(jnp.float32).sum()
        _, s = jax.lax.fori_loop(0, STEPS, body,
                                 (caches, jnp.float32(0)))
        return s

    t = timed(run_ref, memory)
    print(f'XLA decode_step x{STEPS}: {t*1e3:.1f} ms '
          f'({t/STEPS*1e3:.3f} ms/step)')

    # --- pallas fused step loop ---
    weights = pd.prepare_decode_weights(params)
    rots = pd.prepare_rots(xpos_tables, ocr48.N_HEADS)
    mem_k, mem_v = pd.prepare_mem(ref_caches.mem_k, ref_caches.mem_v,
                                  memory_mask)
    embd = params['embd.weight']

    @jax.jit
    def run_pallas(memory):
        self_k = jnp.zeros((pd.L, S, N, pd.EP), jnp.bfloat16)
        self_v = jnp.zeros((pd.L, S, N, pd.EP), jnp.bfloat16)

        def body(step, carry):
            self_k, self_v, s = carry
            tok = jnp.full((N,), 5, jnp.int32)
            tgt = pd.pad_e(embd[tok].astype(jnp.bfloat16))
            out, k_new, v_new, logits = pd.decode_step_pallas(
                step, tgt, rots[step], weights, self_k, self_v,
                mem_k, mem_v, n=N, s_len=S, m_len=M, vp=8064)
            self_k = jax.lax.dynamic_update_slice(
                self_k, k_new[:, None], (0, step, 0, 0))
            self_v = jax.lax.dynamic_update_slice(
                self_v, v_new[:, None], (0, step, 0, 0))
            return self_k, self_v, (s + out.astype(jnp.float32).sum()
                                    + logits.sum() * 0)
        _, _, s = jax.lax.fori_loop(0, STEPS, body,
                                    (self_k, self_v, jnp.float32(0)))
        return s

    t = timed(run_pallas, memory)
    print(f'pallas decode x{STEPS}: {t*1e3:.1f} ms '
          f'({t/STEPS*1e3:.3f} ms/step)')


if __name__ == '__main__':
    main()
