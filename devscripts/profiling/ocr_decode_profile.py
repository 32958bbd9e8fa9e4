"""Where do the ~137 ms of the 48px OCR beam decode go?

Uses the difference method (time a 2N-rep loop minus an N-rep loop) so the
tunnel's fluctuating per-call floor cancels exactly.
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.models.ocr48 import (
    DecodeCaches, decode_step, char_logprobs, init_caches, P,
    convnext_features, encoder_forward)

NK = 160           # 32 crops x 5 beams
MAX_LEN = 64
MEM_LEN = 66       # 256px bucket -> 64 + 2
VOCAB = 7935

def timed(fn, *args, n=8):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
          for k, v in ocr48.init_params(dict_size=VOCAB).items()}
params = ocr48.fuse_qkv_params(params)

rs = np.random.RandomState(0)
memory = jnp.asarray(rs.rand(NK, MEM_LEN, 320).astype(np.float32),
                     jnp.bfloat16)
mem_mask = jnp.zeros((NK, MEM_LEN), bool)
caches0 = init_caches(params, memory, NK, MAX_LEN)
tok0 = jnp.full((NK,), 1, jnp.int32)

def diff_time(step_fn, label, n1=32, n2=96):
    """per-rep time via (t(n2 reps) - t(n1 reps)) / (n2 - n1)."""
    def make(nreps):
        @jax.jit
        def looped(caches, tok):
            def body(i, carry):
                caches, tok, s = carry
                return step_fn(i % MAX_LEN, caches, tok, s)
            _, _, s = jax.lax.fori_loop(
                0, nreps, body, (caches, tok, jnp.float32(0)))
            return s
        return looped
    t1 = timed(make(n1), caches0, tok0)
    t2 = timed(make(n2), caches0, tok0)
    t = (t2 - t1) / (n2 - n1)
    print(f'{label}: {t*1000:.3f} ms/step')
    return t

# 1. full decode_step (5 decoder layers + cache writes)
def f_decode(i, caches, tok, s):
    dec, caches = decode_step(params, caches, tok, i, mem_mask)
    return caches, tok, s + dec.astype(jnp.float32).sum()
diff_time(f_decode, 'decode_step (5 layers)')

# 2. char_logprobs
dec_fix = jnp.asarray(rs.rand(NK, 320).astype(np.float32), jnp.bfloat16)
def f_logp(i, caches, tok, s):
    lp = char_logprobs(params, dec_fix + s.astype(jnp.bfloat16) * 0)
    return caches, tok, s + lp.sum()
diff_time(f_logp, 'char_logprobs')

# 3. top_k over vocab
logp_fix = jnp.asarray(rs.rand(NK, VOCAB).astype(np.float32))
def f_topk(i, caches, tok, s):
    v, idx = jax.lax.top_k(logp_fix + s * 0, 5)
    return caches, tok, s + v.sum() + idx.sum().astype(jnp.float32)
diff_time(f_topk, 'top_k(vocab, 5)')

# 4. cache gather (beam reorder)
perm = jnp.asarray(rs.permutation(NK).astype(np.int32))
def f_gather(i, caches, tok, s):
    idx = (perm + i) % NK
    caches = DecodeCaches(self_k=caches.self_k[:, idx],
                          self_v=caches.self_v[:, idx],
                          mem_k=caches.mem_k, mem_v=caches.mem_v,
                          out=caches.out[idx])
    return caches, tok, s + caches.out[0, 0, 0].astype(jnp.float32)
diff_time(f_gather, 'cache_gather (beam reorder)')

# 5. backbone + encoder one-time cost via batch-size difference method
crops = jnp.asarray(rs.rand(32, 48, 256, 3).astype(np.float32) * 2 - 1)
widths = jnp.asarray([200] * 32, jnp.int32)

@jax.jit
def feats_loop(images):
    def body(i, s):
        m = convnext_features(P(params).scope('backbone'),
                              images + (s * 0).astype(images.dtype))
        return s + m.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

@jax.jit
def feats_loop1(images):
    def body(i, s):
        m = convnext_features(P(params).scope('backbone'),
                              images + (s * 0).astype(images.dtype))
        return s + m.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, 2, body, jnp.float32(0))

t = (timed(feats_loop, crops) - timed(feats_loop1, crops)) / 6
print(f'convnext backbone (32 crops): {t*1000:.2f} ms')

mem_small = jnp.asarray(rs.rand(32, MEM_LEN, 320).astype(np.float32),
                        jnp.bfloat16)
mask_small = jnp.zeros((32, MEM_LEN), bool)

@jax.jit
def enc_loop(m):
    def body(i, s):
        e = encoder_forward(params, m + (s * 0).astype(m.dtype), mask_small)
        return s + e.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

@jax.jit
def enc_loop1(m):
    def body(i, s):
        e = encoder_forward(params, m + (s * 0).astype(m.dtype), mask_small)
        return s + e.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, 2, body, jnp.float32(0))

t = (timed(enc_loop, mem_small) - timed(enc_loop1, mem_small)) / 6
print(f'transformer encoder (32 crops): {t*1000:.2f} ms')

# 6. full beam_decode reference point
@jax.jit
def full_beam(images, widths):
    ret = ocr48.beam_decode(params, images, widths, beams_k=5,
                            max_len=MAX_LEN)
    return ret['probs'].sum()

t = timed(full_beam, crops, widths)
print(f'full beam_decode single call (floor included): {t*1000:.1f} ms')
