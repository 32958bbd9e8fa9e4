"""Stable-Diffusion guided inpainting — TPU-native.

Behavior contract: reference ``inpainting/inpainting_sd.py`` +
``guided_ldm_inpainting.py`` (img2img_inpaint :157-254): blur-fill the
masked region, Gaussian-blur the mask (16px), VAE-encode, replace masked
latents with noise, DDIM-decode 50 uniform steps at guidance 7 while
re-noising the unmasked region from the init latent every step
(GuidedDDIMSample.decode :103-124), blend latents by the mask, VAE-decode,
composite with the original at full resolution. Prompts come from the
booru tagger when its ONNX artifact is present ('masterpiece,best quality'
+ tags), negative prompt fixed.

TPU-first: the full 50-step DDIM loop runs as ONE jitted
``lax.fori_loop`` program — schedule tensors are stacked arrays indexed by
step, not 50 host-dispatched calls (the reference's tqdm loop).
"""
from __future__ import annotations

import functools
import os

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ..config import InpainterConfig
from ..models import sd
from ..models.torch_loader import convert_state_dict
from .common import OfflineInpainter

NEG_PROMPT = ('worst quality, low quality, normal quality,'
              'text,text,text,text')


@functools.partial(jax.jit, static_argnames=('cfg', 'steps', 'guidance'))
def _ddim_inpaint(params, init_latent, nmask, cond, uncond, image_cdt, rng,
                  cfg: sd.SDConfig, steps: int, guidance: float):
    """Full guided DDIM decode in one program.

    init_latent: (1, h, w, z) scaled init latent; nmask (1, h, w, 1) in
    {0,1}; cond/uncond: (1, L, ctx); image_cdt: (1, h, w, 5) hybrid
    conditioning (mask + masked-image latent).
    """
    sch = sd.make_ddim_schedule(steps)
    timesteps = jnp.asarray(sch['timesteps'])
    alphas = jnp.asarray(sch['alphas'])
    alphas_prev = jnp.asarray(sch['alphas_prev'])
    sqrt_oma = jnp.asarray(sch['sqrt_one_minus_alphas'])
    alphas_cumprod = jnp.asarray(sch['alphas_cumprod'])

    t_enc = max(int(min(1.0, 0.999) * steps) - 0, 1)
    t_enc = min(int(0.999 * steps), steps)

    rng, r1 = jax.random.split(rng)
    noise = jax.random.normal(r1, init_latent.shape, init_latent.dtype)
    # stochastic_encode at index t_enc-1 (ddim arrays)
    a_enc = alphas[t_enc - 1]
    x = jnp.sqrt(a_enc) * init_latent + jnp.sqrt(1 - a_enc) * noise

    # cond/uncond run as two sequential batch-1 forwards below: batching
    # them as 2 measured OOM on v5e at 1024px — 16.17G > 15.75G HBM

    def body(i, carry):
        x, rng = carry
        # reversed(timesteps[:t_enc]): step index from the top
        idx = t_enc - 1 - i
        step = timesteps[idx]
        rng, r_q = jax.random.split(rng)
        # re-noise the unmasked region from the init latent (q_sample)
        a_full = alphas_cumprod[step]
        qn = jax.random.normal(r_q, x.shape, x.dtype)
        noised_input = (jnp.sqrt(a_full) * init_latent
                        + jnp.sqrt(1 - a_full) * qn)
        x = (1 - nmask) * noised_input + nmask * x

        x_in = jnp.concatenate([x, image_cdt], axis=-1)
        t_in = jnp.full((1,), step, jnp.int32)
        eps_u = sd.unet_forward(params, x_in, t_in, uncond, cfg)
        eps_c = sd.unet_forward(params, x_in, t_in, cond, cfg)
        eps = eps_u + guidance * (eps_c - eps_u)

        a_t = alphas[idx]
        a_prev = alphas_prev[idx]
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1 - a_prev) * eps           # eta = 0
        x = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        return x, rng

    x, rng = jax.lax.fori_loop(0, t_enc, body, (x, rng))
    x = init_latent * (1 - nmask) + x * nmask
    img = sd.vae_decode(params, x, cfg)
    return jnp.clip(img, -1.0, 1.0)


@functools.partial(jax.jit, static_argnames=('cfg', 'steps', 'guidance'))
def _dpmpp_inpaint(params, init_latent, nmask, cond, uncond, image_cdt, rng,
                   cfg: sd.SDConfig, steps: int, guidance: float):
    """Guided DPM-Solver++(2M) decode in one program (multistep
    data-prediction solver, eta=0). Same per-step cost as DDIM (two UNet
    forwards under guidance) but converges in ~15 steps instead of 50 —
    the reference ships the equivalent sampler at
    ``inpainting/ldm/models/diffusion/dpm_solver/sampler.py``; this is the
    2M variant expressed as a ``lax.fori_loop`` over static schedule
    arrays, carrying the previous data prediction for the second-order
    correction."""
    sch = sd.make_ddim_schedule(steps)
    timesteps = jnp.asarray(sch['timesteps'])
    alphas = jnp.asarray(sch['alphas'])            # ddim ᾱ at timesteps
    alphas_prev = jnp.asarray(sch['alphas_prev'])
    alphas_cumprod = jnp.asarray(sch['alphas_cumprod'])

    t_enc = min(int(0.999 * steps), steps)

    rng, r1 = jax.random.split(rng)
    noise = jax.random.normal(r1, init_latent.shape, init_latent.dtype)
    a_enc = alphas[t_enc - 1]
    x = jnp.sqrt(a_enc) * init_latent + jnp.sqrt(1 - a_enc) * noise

    def lam(a):
        # log-SNR: log(alpha/sigma) with alpha=sqrt(ᾱ), sigma=sqrt(1-ᾱ)
        return 0.5 * (jnp.log(a) - jnp.log1p(-a))

    def body(i, carry):
        x, x0_prev, h_prev, rng = carry
        idx = t_enc - 1 - i
        step = timesteps[idx]
        rng, r_q = jax.random.split(rng)
        # re-noise the unmasked region from the init latent (q_sample)
        a_full = alphas_cumprod[step]
        qn = jax.random.normal(r_q, x.shape, x.dtype)
        noised_input = (jnp.sqrt(a_full) * init_latent
                        + jnp.sqrt(1 - a_full) * qn)
        x = (1 - nmask) * noised_input + nmask * x

        x_in = jnp.concatenate([x, image_cdt], axis=-1)
        t_in = jnp.full((1,), step, jnp.int32)
        eps_u = sd.unet_forward(params, x_in, t_in, uncond, cfg)
        eps_c = sd.unet_forward(params, x_in, t_in, cond, cfg)
        eps = eps_u + guidance * (eps_c - eps_u)

        a_t = alphas[idx]
        a_next = alphas_prev[idx]
        sig_t = jnp.sqrt(1 - a_t)
        sig_next = jnp.sqrt(1 - a_next)
        x0 = (x - sig_t * eps) / jnp.sqrt(a_t)

        h = lam(a_next) - lam(a_t)
        r = h_prev / h
        d = jnp.where(i == 0, x0,
                      (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev)
        x = (sig_next / sig_t) * x - jnp.sqrt(a_next) * jnp.expm1(-h) * d
        return x, x0, h, rng

    h0 = jnp.float32(1.0)  # placeholder; i==0 ignores the 2nd-order term
    x, _, _, rng = jax.lax.fori_loop(
        0, t_enc, body, (x, jnp.zeros_like(x), h0, rng))
    x = init_latent * (1 - nmask) + x * nmask
    img = sd.vae_decode(params, x, cfg)
    return jnp.clip(img, -1.0, 1.0)


_SAMPLERS = {'ddim': _ddim_inpaint, 'dpmpp_2m': _dpmpp_inpaint}


def _fill_mask_input(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Blur-fill masked regions from surrounding colors (reference
    fill_mask_input :135-151, PIL alpha-composite pyramid) — cv2 variant."""
    out = image.astype(np.float32)
    m = (mask > 127).astype(np.float32)[:, :, None]
    filled = out * (1 - m)
    weight = 1 - m
    for radius in (256, 64, 16, 4, 2):
        k = max(1, int(radius) | 1)
        b_img = cv2.GaussianBlur(filled, (0, 0), k / 3.0 + 1e-3)
        b_w = cv2.GaussianBlur(weight[:, :, 0], (0, 0), k / 3.0 + 1e-3)
        safe = np.where(b_w > 1e-4, b_w, 1.0)[:, :, None]
        cand = b_img / safe
        fill_now = (weight[:, :, 0] < 0.5) & (b_w > 1e-4)
        filled[fill_now] = (filled[fill_now] * weight[fill_now]
                            + cand[fill_now] * (1 - weight[fill_now]))
        weight[:, :, 0][fill_now] = 1.0
    return np.clip(filled, 0, 255).astype(np.uint8)


class SimpleCLIPTokenizer:
    """Offline-capable CLIP tokenizer wrapper: uses transformers'
    CLIPTokenizer (local cache first, then hub download), else falls back
    to a deterministic hash tokenizer — smoke tests / random-weight mode
    ONLY. With real SD weights a missing vocab raises instead of silently
    producing garbage conditioning (ADVICE r2 low #2): the hard-fail
    policy of utils/inference.MissingWeightsError applies to the
    tokenizer artifact too."""

    def __init__(self, vocab_size: int, max_tokens: int,
                 require_real: bool = False):
        self.vocab_size = vocab_size
        self.max_tokens = max_tokens
        self._hf = None
        err = None
        for local_only in (True, False):
            try:
                from transformers import CLIPTokenizer
                self._hf = CLIPTokenizer.from_pretrained(
                    'openai/clip-vit-large-patch14',
                    local_files_only=local_only)
                break
            except Exception as e:
                err = e
        if self._hf is None and require_real:
            from ..utils.inference import MissingWeightsError
            raise MissingWeightsError(
                'StableDiffusionInpainter: CLIP tokenizer vocab unavailable '
                f'({err}); refusing hash-tokenizer conditioning with real '
                'SD weights. Provide the openai/clip-vit-large-patch14 '
                'tokenizer files in the HF cache.')

    def __call__(self, text: str) -> np.ndarray:
        if self._hf is not None:
            ids = self._hf(text, padding='max_length', truncation=True,
                           max_length=self.max_tokens)['input_ids']
            return np.asarray(ids, np.int32)[None]
        ids = [(hash(w) % (self.vocab_size - 3)) + 3
               for w in text.split(',') if w.strip()]
        ids = [1] + ids[:self.max_tokens - 2] + [2]
        ids += [0] * (self.max_tokens - len(ids))
        return np.asarray(ids, np.int32)[None]


class StableDiffusionInpainter(OfflineInpainter):
    """SD-1.5-inpaint (9-channel hybrid UNet) guided img2img inpainting.

    Checkpoint: the reference's abyssorangemix2 inpainting safetensors
    (inpainting_sd.py:48-52). The booru tagger (wd-swinv2 ONNX) is optional:
    without it the prompt is the quality prefix only.
    """

    _MODEL_MAPPING = {
        'model': {
            'url': 'https://civitai.com/api/download/models/8364',
            'hash': 'dd680bd77d553e095faf58ff8c12584efe2a9b844e18bcc6ba2a366b'
                    '85caceb8',
            'file': 'abyssorangemix2_Hard-inpainting.safetensors',
        },
        'model_wd_swinv2': {
            'url': 'https://huggingface.co/SmilingWolf/'
                   'wd-v1-4-swinv2-tagger-v2/resolve/main/model.onnx',
            'hash': '04ec04fdf7db74b4fed7f4b52f52e04dec4dbad9e4d88d2d178f'
                    '334079a29fde',
            'file': 'wd_swinv2.onnx',
        },
        'model_wd_swinv2_csv': {
            'url': 'https://huggingface.co/SmilingWolf/'
                   'wd-v1-4-swinv2-tagger-v2/raw/main/selected_tags.csv',
            'hash': '8c8750600db36233a1b274ac88bd46289e588b338218c2e4c62bb'
                    'c9f2b516368',
            'file': 'selected_tags.csv',
        },
    }

    def __init__(self):
        super().__init__()
        self.params = None
        self.cfg = None
        self.tokenizer = None
        self.tagger = None

    async def _load(self, device: str):
        ckpt = self._get_file_path(
            'abyssorangemix2_Hard-inpainting.safetensors')
        if ckpt.is_file():
            self.cfg = sd.SDConfig()
            sdict = _load_safetensors(str(ckpt))
            self.params = convert_state_dict(
                sdict, embedding_patterns=sd.EMBEDDING_PATTERNS)
        else:
            from ..utils.inference import MissingWeightsError, \
                random_weights_allowed
            if not random_weights_allowed(self):
                raise MissingWeightsError(
                    'StableDiffusionInpainter: checkpoint unavailable. '
                    'Set MIT_TPU_ALLOW_RANDOM_WEIGHTS=1 for smoke tests.')
            self.logger.warning('SD checkpoint unavailable — tiny random '
                                'config (smoke-test mode)')
            self.using_random_weights = True
            self.cfg = sd.SDConfig.tiny()
            self.params = sd.init_params(self.cfg)
        self.tokenizer = SimpleCLIPTokenizer(
            self.cfg.vocab_size, self.cfg.max_tokens,
            require_real=not self.using_random_weights)
        tagger_path = self._get_file_path('wd_swinv2.onnx')
        tags_path = self._get_file_path('selected_tags.csv')
        if tagger_path.is_file() and tags_path.is_file():
            from .booru_tagger import Tagger
            self.tagger = Tagger(tagger_path, tags_path)
        else:
            self.logger.warning(
                'wd-swinv2 tagger artifacts unavailable — SD prompts use '
                'the quality prefix only (reference behavior needs '
                'wd_swinv2.onnx + selected_tags.csv)')

    async def _unload(self):
        self.params = None

    def _tags(self, image: np.ndarray) -> str:
        """Booru tags for the prompt (reference inpainting_sd.py:108-111:
        label_cv2_bgr on the BGR page, '_'→' ', comma-joined)."""
        if self.tagger is None:
            return ''
        tags = self.tagger.label_cv2_bgr(
            cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
        self.logger.info(f'tags={list(tags)}')
        return ','.join(t.replace('_', ' ') for t in tags)

    async def _infer(self, image: np.ndarray, mask: np.ndarray,
                     config: InpainterConfig, inpainting_size: int = 1024,
                     verbose: bool = False) -> np.ndarray:
        img_original = np.copy(image)
        mask_original = (np.copy(mask) >= 127).astype(np.uint8)[:, :, None]
        height, width = image.shape[:2]

        if max(image.shape[:2]) > inpainting_size:
            ratio = inpainting_size / max(height, width)
            new_size = (round(width * ratio), round(height * ratio))
            image = cv2.resize(image, new_size,
                               interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask, new_size,
                              interpolation=cv2.INTER_LINEAR)
        pad = 64
        h, w = image.shape[:2]
        new_h = h + ((-h) % pad)
        new_w = w + ((-w) % pad)
        if (new_h, new_w) != (h, w):
            image = cv2.resize(image, (new_w, new_h),
                               interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask, (new_w, new_h),
                              interpolation=cv2.INTER_LINEAR)
        self.logger.info(f'Inpainting resolution: {new_w}x{new_h}')

        tags = self._tags(image)
        pos = 'masterpiece,best quality' + (',' + tags if tags else '')
        # DPM-Solver++(2M) converges in ~15 steps where DDIM needs 50
        # (reference ships the same trade at ldm/models/diffusion/
        # dpm_solver/); devscripts/profiling/sd_sampler_ab.py records the
        # measured per-step cost
        sampler = os.environ.get('MIT_TPU_SD_SAMPLER', 'dpmpp_2m')
        sample_fn = _SAMPLERS[sampler]
        steps = int(os.environ.get(
            'MIT_TPU_SD_STEPS', '15' if sampler == 'dpmpp_2m' else '50'))

        # mask blur + blur fill (reference img2img_inpaint :216-222)
        mask_blur = cv2.GaussianBlur(mask, (0, 0), 16 / 3.0)
        image_filled = _fill_mask_input(image, mask_blur)

        rng = jax.random.PRNGKey(
            int.from_bytes(os.urandom(4), 'little')
            if os.environ.get('MIT_TPU_SD_SEED') is None
            else int(os.environ['MIT_TPU_SD_SEED']))
        rng, r_enc, r_init = jax.random.split(rng, 3)

        img_j = jnp.asarray(image_filled, jnp.float32)[None] / 127.5 - 1.0
        moments = sd.vae_encode_moments(self.params, img_j, self.cfg)
        init_latent = sd.vae_sample(moments, r_enc, self.cfg.scale_factor)

        lh, lw = init_latent.shape[1:3]
        latmask = cv2.resize(mask_blur, (lw, lh),
                             interpolation=cv2.INTER_LINEAR)
        latmask = np.around(latmask.astype(np.float32) / 255.0)
        nmask = jnp.asarray(latmask, jnp.float32)[None, :, :, None]
        init_latent = ((1 - nmask) * init_latent
                       + nmask * jax.random.normal(r_init,
                                                   init_latent.shape))

        # hybrid image conditioning: rounded mask + masked-image latent
        cond_mask_px = jnp.asarray(
            np.round(mask_blur.astype(np.float32) / 255.0), jnp.float32)
        cond_img = img_j * (1.0 - cond_mask_px[None, :, :, None])
        rng, r_c = jax.random.split(rng)
        cmoments = sd.vae_encode_moments(self.params, cond_img, self.cfg)
        cond_latent = sd.vae_sample(cmoments, r_c, self.cfg.scale_factor)
        cond_mask_lat = jnp.asarray(
            cv2.resize(np.asarray(cond_mask_px), (lw, lh),
                       interpolation=cv2.INTER_NEAREST),
            jnp.float32)[None, :, :, None]
        image_cdt = jnp.concatenate([cond_mask_lat, cond_latent], axis=-1)

        cond = sd.clip_text_forward(
            self.params, jnp.asarray(self.tokenizer(pos)), self.cfg)
        uncond = sd.clip_text_forward(
            self.params, jnp.asarray(self.tokenizer(NEG_PROMPT)), self.cfg)

        out = sample_fn(self.params, init_latent, nmask, cond, uncond,
                        image_cdt, rng, self.cfg, steps, 7.0)
        img_inpainted = np.asarray(
            jnp.clip(jnp.round((out[0] + 1.0) * 127.5), 0, 255)
            .astype(jnp.uint8))
        if img_inpainted.shape[:2] != (height, width):
            img_inpainted = cv2.resize(img_inpainted, (width, height),
                                       interpolation=cv2.INTER_LINEAR)
        return (img_inpainted * mask_original
                + img_original * (1 - mask_original)).astype(np.uint8)


def _load_safetensors(path: str) -> dict:
    try:
        from safetensors.torch import load_file
        return load_file(path)
    except ImportError:
        import torch
        return torch.load(path, map_location='cpu', weights_only=True)
