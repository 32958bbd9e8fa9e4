"""SD inpainter: tiny-config end-to-end smoke + component checks."""
import asyncio

import numpy as np
import pytest


def test_sd_components_shapes():
    import jax
    import jax.numpy as jnp
    from manga_image_translator_tpu.models import sd

    cfg = sd.SDConfig.tiny()
    params = sd.init_params(cfg)
    eps = sd.unet_forward(params, jnp.zeros((2, 16, 16, cfg.in_channels)),
                          jnp.array([3, 7]),
                          jnp.zeros((2, cfg.max_tokens, cfg.context_dim)),
                          cfg)
    assert eps.shape == (2, 16, 16, 4)
    m = sd.vae_encode_moments(params, jnp.zeros((1, 32, 32, 3)), cfg)
    z = sd.vae_sample(m, jax.random.PRNGKey(0), cfg.scale_factor)
    dec = sd.vae_decode(params, z, cfg)
    assert dec.shape == (1, 32, 32, 3)
    h = sd.clip_text_forward(params, jnp.zeros((1, cfg.max_tokens),
                                               jnp.int32), cfg)
    assert h.shape == (1, cfg.max_tokens, cfg.text_width)


def test_ddim_schedule_matches_ldm():
    """Uniform discretize: timesteps arange(0,1000,1000//S)+1, alphas from
    the linear sqrt-beta schedule (reference ddim.py make_schedule)."""
    from manga_image_translator_tpu.models import sd
    sch = sd.make_ddim_schedule(50)
    assert sch['timesteps'][0] == 1 and sch['timesteps'][-1] == 981
    assert len(sch['timesteps']) == 50
    # alphas_cumprod decreasing in (0, 1)
    a = sch['alphas_cumprod']
    assert a[0] > 0.99 and a[-1] < 0.01 and np.all(np.diff(a) < 0)
    assert np.allclose(sch['alphas_prev'][1:], sch['alphas'][:-1])


def test_sd_inpainter_smoke(monkeypatch):
    """Inpainter.sd end-to-end on the tiny random config: must produce an
    image, not raise (VERDICT r1 missing #1)."""
    monkeypatch.setenv('MIT_TPU_SD_STEPS', '2')
    monkeypatch.setenv('MIT_TPU_SD_SEED', '0')
    from manga_image_translator_tpu.config import InpainterConfig
    from manga_image_translator_tpu.inpainting.inpainting_sd import \
        StableDiffusionInpainter

    inp = StableDiffusionInpainter()
    inp.allow_random_weights = True
    asyncio.run(inp.load('cpu'))
    img = np.full((96, 80, 3), 200, np.uint8)
    mask = np.zeros((96, 80), np.uint8)
    mask[30:60, 20:60] = 255
    out = asyncio.run(inp._infer(img, mask, InpainterConfig(),
                                 inpainting_size=128))
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    # unmasked pixels untouched
    np.testing.assert_array_equal(out[:10, :10], img[:10, :10])


def test_sd_inpainter_registry():
    from manga_image_translator_tpu.config import Inpainter
    from manga_image_translator_tpu import inpainting
    assert Inpainter.sd in inpainting.INPAINTERS


def test_sd_inpainter_dpmpp_smoke(monkeypatch):
    """DPM-Solver++(2M) sampler path (default) on the tiny config."""
    monkeypatch.setenv('MIT_TPU_SD_SAMPLER', 'dpmpp_2m')
    monkeypatch.setenv('MIT_TPU_SD_STEPS', '3')
    monkeypatch.setenv('MIT_TPU_SD_SEED', '0')
    from manga_image_translator_tpu.config import InpainterConfig
    from manga_image_translator_tpu.inpainting.inpainting_sd import \
        StableDiffusionInpainter

    inp = StableDiffusionInpainter()
    inp.allow_random_weights = True
    asyncio.run(inp.load('cpu'))
    img = np.full((96, 80, 3), 200, np.uint8)
    mask = np.zeros((96, 80), np.uint8)
    mask[30:60, 20:60] = 255
    out = asyncio.run(inp._infer(img, mask, InpainterConfig(),
                                 inpainting_size=128))
    assert out.shape == img.shape and out.dtype == np.uint8
    # outside the mask the composite preserves the input
    assert (out[mask == 0] == img[mask == 0]).all()


def test_dpmpp_matches_ddim_limit():
    """With many steps both samplers integrate the same probability-flow
    ODE: on a LINEAR eps model (eps = c*x, exactly solvable) DPM-Solver++
    at 16 steps must land near the DDIM 64-step solution."""
    import jax.numpy as jnp
    from manga_image_translator_tpu.models import sd

    # analytic check on the solver math alone (no UNet): iterate the same
    # update rules the jitted bodies apply, with eps(x, t) = 0.8 * x
    def run(sampler_steps, second_order):
        sch = sd.make_ddim_schedule(sampler_steps)
        alphas = sch['alphas']
        alphas_prev = sch['alphas_prev']
        t_enc = min(int(0.999 * sampler_steps), sampler_steps)
        x = 1.0  # scalar state
        x0_prev, h_prev = 0.0, 1.0
        lam = lambda a: 0.5 * (np.log(a) - np.log1p(-a))
        for i in range(t_enc):
            idx = t_enc - 1 - i
            a_t, a_next = alphas[idx], alphas_prev[idx]
            eps = 0.8 * x
            sig_t, sig_next = np.sqrt(1 - a_t), np.sqrt(1 - a_next)
            x0 = (x - sig_t * eps) / np.sqrt(a_t)
            if second_order:
                h = lam(a_next) - lam(a_t)
                r = h_prev / h
                d = x0 if i == 0 else ((1 + 1 / (2 * r)) * x0
                                       - (1 / (2 * r)) * x0_prev)
                x = (sig_next / sig_t) * x - np.sqrt(a_next) * np.expm1(-h) * d
                x0_prev, h_prev = x0, h
            else:
                x = np.sqrt(a_next) * x0 + sig_next * eps
        return x

    ddim_fine = run(64, False)
    dpmpp = run(16, True)
    ddim_coarse = run(16, False)
    # 2nd-order at 16 steps is closer to the fine solution than DDIM at 16
    assert abs(dpmpp - ddim_fine) < abs(ddim_coarse - ddim_fine)
    assert abs(dpmpp - ddim_fine) < 0.05 * abs(ddim_fine)
