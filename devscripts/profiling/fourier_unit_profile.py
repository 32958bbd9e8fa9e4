import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models.lama import (
    _rfft2_matmul, _irfft2_matmul, _dft_mats, _PREC)

H = W = 192
C = 192

def timed(fn, *args, n=10):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(1, H, W, C).astype(np.float32))

@jax.jit
def rfft_only(x):
    re, im = _rfft2_matmul(x)
    return re.sum() + im.sum()

print('rfft2 (x16 loop):', end=' ')
@jax.jit
def rfft_16(x):
    s = 0.0
    y = x
    for _ in range(16):
        re, im = _rfft2_matmul(y)
        s = s + re.sum() + im.sum()
        y = y + 1e-6 * s  # serialize
    return s
print(timed(rfft_16, x) / 16)

@jax.jit
def roundtrip_16(x):
    s = 0.0
    y = x
    for _ in range(16):
        re, im = _rfft2_matmul(y)
        out = _irfft2_matmul(re, im, H, W)
        s = s + out.sum()
        y = y + 1e-6 * s
    return s
print('rfft2+irfft2 (x16):', timed(roundtrip_16, x) / 16)

# same matmuls in pure bf16 (no HIGH 3-pass)
cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm = _dft_mats(H, W)
cw = jnp.asarray(cos_w, jnp.bfloat16); sw = jnp.asarray(sin_w, jnp.bfloat16)
ch = jnp.asarray(cos_h, jnp.bfloat16); sh = jnp.asarray(sin_h, jnp.bfloat16)

@jax.jit
def rfft_bf16_16(x):
    s = 0.0
    y = x.astype(jnp.bfloat16)
    for _ in range(16):
        re_w = jnp.einsum('nhwc,wk->nhkc', y, cw)
        im_w = -jnp.einsum('nhwc,wk->nhkc', y, sw)
        re = (jnp.einsum('nhkc,hj->njkc', re_w, ch)
              + jnp.einsum('nhkc,hj->njkc', im_w, sh))
        im = (jnp.einsum('nhkc,hj->njkc', im_w, ch)
              - jnp.einsum('nhkc,hj->njkc', re_w, sh))
        s = s + re.astype(jnp.float32).sum() + im.astype(jnp.float32).sum()
        y = y + jnp.bfloat16(1e-3) * jnp.bfloat16(s * 0)
    return s
print('rfft2 pure bf16 (x16):', timed(rfft_bf16_16, x) / 16)

# reshaped formulation: move contraction to minor axis explicitly
@jax.jit
def rfft_reshaped_16(x):
    s = 0.0
    y = x
    cwj = jnp.asarray(np.concatenate([cos_w, -sin_w], 1))  # (W, 2K)
    chj = jnp.asarray(np.concatenate([cos_h, -sin_h], 1))  # (H, 2H)
    for _ in range(16):
        t = jnp.transpose(y, (0, 1, 3, 2)).reshape(-1, W)       # (NHC, W)
        f = jnp.dot(t, cwj, precision=_PREC)                    # (NHC, 2K)
        s = s + f.sum()
        y = y + 1e-6 * s
    return s
print('rfft W-stage joined reshaped (x16):', timed(rfft_reshaped_16, x) / 16)

# plain conv cost at FU shape for comparison
wconv = jnp.asarray(rs.rand(1, 1, 2 * C, 2 * C).astype(np.float32),
                    jnp.bfloat16)
xc = jnp.asarray(rs.rand(1, H, W // 2 + 1, 2 * C).astype(np.float32),
                 jnp.bfloat16)

@jax.jit
def conv16(xc):
    s = 0.0
    y = xc
    for _ in range(16):
        y = jax.lax.conv_general_dilated(
            y, wconv, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        s = s + y.astype(jnp.float32).sum()
    return s
print('FU 1x1 conv 384->384 (x16):', timed(conv16, xc) / 16)
