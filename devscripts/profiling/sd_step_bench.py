"""One DDIM UNet step + VAE encode/decode at full SD-1.5 size on v5e
(VERDICT r2 #5b: record what a 50-step 1024px SD inpaint would cost).

Random full-size weights in bf16; latents for a 1024x1024 page are
128x128. Prints per-call times; 50-step DDIM cost ~= 2x unet (cond+uncond
are batched as 2 in production) x steps + vae encode + decode.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import sd


def timed(fn, *args, n=6):
    for _ in range(2):
        float(jnp.sum(fn(*args)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = sd.SDConfig()
    params = sd.init_params(cfg, dtype=jnp.bfloat16)
    n_par = sum(int(np.prod(v.shape)) for v in params.values())
    print(f'params: {n_par / 1e6:.0f}M (bf16)')
    rs = np.random.RandomState(0)

    # UNet at batch 1: cond+uncond batched as 2 OOMs v5e HBM at 128x128
    # latents (measured: 16.17G > 15.75G) — production runs them as two
    # sequential batch-1 calls at 1024px pages.
    x = jnp.asarray(rs.randn(1, 128, 128, 9).astype(np.float32),
                    jnp.bfloat16)
    t = jnp.asarray([501.0])
    ctx = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32),
                      jnp.bfloat16)
    unet = jax.jit(lambda p, x, t, c: sd.unet_forward(p, x, t, c, cfg))
    tu = timed(unet, params, x, t, ctx) * 2      # cond + uncond
    print(f'unet step 2x(1, 128, 128, 9) bf16: {tu*1e3:.1f} ms')

    img = jnp.asarray(rs.rand(1, 1024, 1024, 3).astype(np.float32) * 2 - 1,
                      jnp.bfloat16)
    enc = jax.jit(lambda p, x: sd.vae_encode_moments(p, x, cfg))
    te = timed(enc, params, img)
    print(f'vae encode 1024px: {te*1e3:.1f} ms')

    z = jnp.asarray(rs.randn(1, 128, 128, 4).astype(np.float32),
                    jnp.bfloat16)
    dec = jax.jit(lambda p, z: sd.vae_decode(p, z, cfg))
    td = timed(dec, params, z)
    print(f'vae decode 128->1024px: {td*1e3:.1f} ms')

    total = 50 * tu + te + td
    print(f'estimated 50-step DDIM inpaint @1024px: {total:.2f} s')


if __name__ == '__main__':
    main()
