#!/usr/bin/env python
"""SD inpaint sampler A/B: DDIM-50 vs DPM-Solver++(2M)-15 wall time.

The reference ships DPM-Solver next to DDIM
(/root/reference/manga_translator/inpainting/ldm/models/diffusion/
dpm_solver/sampler.py) precisely for this trade: same two-UNet-forward
step cost, ~15 steps instead of 50. Both samplers here are the production
one-program loops from inpainting/inpainting_sd.py, run at the production
1024px resolution (latent 128x128) with full-size random bf16 weights.

Single calls (seconds each) — the ~50 ms tunnel call floor is noise at
this scale, so no on-chip looping is needed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import sd
from manga_image_translator_tpu.inpainting.inpainting_sd import (
    _ddim_inpaint, _dpmpp_inpaint)


def main():
    cfg = sd.SDConfig()
    params = sd.init_params(cfg, dtype=jnp.bfloat16)

    lh = lw = 128                       # 1024px page -> 128x128 latent
    rng = jax.random.PRNGKey(0)
    r = jax.random.split(rng, 6)
    init_latent = jax.random.normal(r[0], (1, lh, lw, 4), jnp.float32)
    nmask = (jax.random.uniform(r[1], (1, lh, lw, 1)) < 0.2).astype(
        jnp.float32)
    cond = jax.random.normal(r[2], (1, cfg.max_tokens, cfg.context_dim),
                             jnp.float32)
    uncond = jax.random.normal(r[3], (1, cfg.max_tokens, cfg.context_dim),
                               jnp.float32)
    image_cdt = jax.random.normal(r[4], (1, lh, lw, 5), jnp.float32)

    arms = [('ddim', _ddim_inpaint, 50),
            ('ddim', _ddim_inpaint, 15),
            ('dpmpp_2m', _dpmpp_inpaint, 15)]
    for name, fn, steps in arms:
        out = fn(params, init_latent, nmask, cond, uncond, image_cdt,
                 r[5], cfg, steps, 7.0)
        out.block_until_ready()         # warm (compile)
        t0 = time.perf_counter()
        out = fn(params, init_latent, nmask, cond, uncond, image_cdt,
                 r[5], cfg, steps, 7.0)
        float(out.sum())
        t = time.perf_counter() - t0
        print(f'{name:9s} steps={steps:2d}: {t:7.2f} s/page '
              f'({t / steps * 1000:6.1f} ms/step)')


if __name__ == '__main__':
    main()
