"""Stable Diffusion inpainting stack (UNet + VAE + CLIP text) — TPU-native.

Architecture contract: the reference's ldm tree as configured by
``inpainting/guided_ldm_inpaint9_v15.yaml`` — SD-1.x latent diffusion with a
9-channel (hybrid-conditioned) UNet (reference
``inpainting/ldm/modules/diffusionmodules/openaimodel.py`` UNetModel),
AutoencoderKL (``ldm/models/autoencoder.py``) and the frozen CLIP ViT-L/14
text encoder (``ldm/modules/encoders/modules.py`` FrozenCLIPEmbedder).
This is a from-scratch JAX implementation, not a port of the vendored 11k
LoC ldm package: one flat checkpoint-keyed param dict, NHWC layouts,
everything jittable; the DDIM loop lives in the inpainter as a single
``lax.fori_loop`` program rather than 50 host-dispatched steps.

Param keys mirror the SD checkpoint key space (post torch->JAX layout
conversion by models.torch_loader), so checkpoint loading is mechanical:
``model.diffusion_model.*``, ``first_stage_model.*``,
``cond_stage_model.transformer.text_model.*``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .functional import P, group_norm, interpolate_nearest


# --------------------------------------------------------------------------
# config
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SDConfig:
    """Shapes for the SD stack; ``tiny()`` exercises the same code paths in
    tests without 860M parameters."""
    in_channels: int = 9
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (1, 2, 4)   # in downsample factors
    num_heads: int = 8
    context_dim: int = 768
    transformer_depth: int = 1
    # VAE
    vae_channels: int = 128
    vae_ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    vae_num_res: int = 2
    z_channels: int = 4
    scale_factor: float = 0.18215
    # CLIP text
    vocab_size: int = 49408
    max_tokens: int = 77
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12

    @staticmethod
    def tiny() -> 'SDConfig':
        return SDConfig(model_channels=32, channel_mult=(1, 2),
                        num_res_blocks=1, attention_resolutions=(1, 2),
                        num_heads=2, context_dim=64, vae_channels=32,
                        vae_ch_mult=(1, 2), vae_num_res=1, vocab_size=97,
                        max_tokens=16, text_width=64, text_layers=2,
                        text_heads=2)


def silu(x):
    return x * jax.nn.sigmoid(x)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000
                       ) -> jax.Array:
    """(B,) int timesteps -> (B, dim) sinusoidal embedding (ldm util)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _gn(p: P, name: str, x, groups: int = 32):
    g = min(groups, x.shape[-1])
    return group_norm(x, g, p[f'{name}.weight'], p[f'{name}.bias'],
                      eps=1e-6 if name.startswith(('norm', 'up', 'down'))
                      else 1e-5)


# --------------------------------------------------------------------------
# UNet
# --------------------------------------------------------------------------

def _res_block(p: P, x, emb):
    h = group_norm(x, min(32, x.shape[-1]), p['in_layers.0.weight'],
                   p['in_layers.0.bias'])
    h = p.conv('in_layers.2', silu(h), padding=1)
    e = p.dense('emb_layers.1', silu(emb))
    h = h + e[:, None, None, :].astype(h.dtype)
    h = group_norm(h, min(32, h.shape[-1]), p['out_layers.0.weight'],
                   p['out_layers.0.bias'])
    h = p.conv('out_layers.3', silu(h), padding=1)
    if 'skip_connection.weight' in p:
        x = p.conv('skip_connection', x)
    return x + h


# Above this query length, attention runs in query chunks: a manga page at
# 1024px has 128x128=16384 latent tokens in the top UNet level, and the
# full (16384, 16384) score matrix x8 heads is ~4-8GB — past v5e HBM once
# weights and skip activations are resident. Chunking caps live score
# memory at (QCHUNK, L) per head while keeping every matmul MXU-sized.
_ATTN_QCHUNK = 4096


def _attention(q, k, v, heads: int):
    b, lq, c = q.shape
    lk = k.shape[1]
    hd = c // heads
    q = q.reshape(b, lq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, lk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, lk, heads, hd).transpose(0, 2, 1, 3)

    def attend(qc):
        scores = jnp.einsum('bhqd,bhkd->bhqk', qc, k,
                            preferred_element_type=jnp.float32) \
            * (hd ** -0.5)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum('bhqk,bhkd->bhqd', w, v,
                          preferred_element_type=jnp.float32
                          ).astype(v.dtype)

    if lq > _ATTN_QCHUNK and lq % _ATTN_QCHUNK == 0:
        nch = lq // _ATTN_QCHUNK
        qs = q.reshape(b, heads, nch, _ATTN_QCHUNK, hd) \
            .transpose(2, 0, 1, 3, 4)
        out = jax.lax.map(attend, qs)            # serial: bounds memory
        out = out.transpose(1, 2, 0, 3, 4).reshape(b, heads, lq, hd)
    else:
        out = attend(q)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, c)


def _mha(p: P, q_src, kv_src, heads: int, prefix: str):
    q = p.dense(f'{prefix}.to_q', q_src)
    k = p.dense(f'{prefix}.to_k', kv_src)
    v = p.dense(f'{prefix}.to_v', kv_src)
    out = _attention(q, k, v, heads)
    return p.dense(f'{prefix}.to_out.0', out)


def _geglu_ff(p: P, x):
    h = p.dense('net.0.proj', x)
    a, b = jnp.split(h, 2, axis=-1)
    return p.dense('net.2', a * jax.nn.gelu(b, approximate=False))


def _spatial_transformer(p: P, x, context, heads: int):
    n, h, w, c = x.shape
    res = x
    xn = _gn(p, 'norm', x)
    xn = p.conv('proj_in', xn)
    t = xn.reshape(n, h * w, c)
    tb = p.scope('transformer_blocks.0')
    t = t + _mha(tb, tb.ln('norm1', t), tb.ln('norm1', t), heads, 'attn1')
    t = t + _mha(tb, tb.ln('norm2', t), context, heads, 'attn2')
    t = t + _geglu_ff(tb.scope('ff'), tb.ln('norm3', t))
    t = t.reshape(n, h, w, c)
    return p.conv('proj_out', t) + res


def unet_forward(params: Dict, x: jax.Array, t: jax.Array,
                 context: jax.Array, cfg: SDConfig = SDConfig()
                 ) -> jax.Array:
    """x: (B, H, W, in_channels) latent input; t: (B,) timesteps;
    context: (B, L, context_dim) CLIP states -> (B, H, W, 4) eps."""
    p = P(params).scope('model.diffusion_model')
    emb = timestep_embedding(t, cfg.model_channels)
    emb = p.dense('time_embed.2', silu(p.dense('time_embed.0', emb)))
    emb = emb.astype(x.dtype)
    context = context.astype(x.dtype)

    hs: List[jax.Array] = []
    h = p.conv('input_blocks.0.0', x, padding=1)
    hs.append(h)
    idx = 1
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            bp = p.scope(f'input_blocks.{idx}')
            h = _res_block(bp.scope('0'), h, emb)
            if ds in cfg.attention_resolutions:
                h = _spatial_transformer(bp.scope('1'), h, context,
                                         cfg.num_heads)
            hs.append(h)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            h = p.scope(f'input_blocks.{idx}').scope('0').conv(
                'op', h, stride=2, padding=1)
            hs.append(h)
            idx += 1
            ds *= 2

    h = _res_block(p.scope('middle_block.0'), h, emb)
    h = _spatial_transformer(p.scope('middle_block.1'), h, context,
                             cfg.num_heads)
    h = _res_block(p.scope('middle_block.2'), h, emb)

    idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            bp = p.scope(f'output_blocks.{idx}')
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = _res_block(bp.scope('0'), h, emb)
            sub = 1
            if ds in cfg.attention_resolutions:
                h = _spatial_transformer(bp.scope(str(sub)), h, context,
                                         cfg.num_heads)
                sub += 1
            if level != 0 and i == cfg.num_res_blocks:
                h = interpolate_nearest(h, 2)
                h = bp.scope(str(sub)).conv('conv', h, padding=1)
                ds //= 2
            idx += 1

    h = group_norm(h, min(32, h.shape[-1]), p['out.0.weight'], p['out.0.bias'])
    return p.conv('out.2', silu(h), padding=1)


# --------------------------------------------------------------------------
# VAE (AutoencoderKL)
# --------------------------------------------------------------------------

def _vae_resnet(p: P, x):
    h = _gn(p, 'norm1', x)
    h = p.conv('conv1', silu(h), padding=1)
    h = _gn(p, 'norm2', h)
    h = p.conv('conv2', silu(h), padding=1)
    if 'nin_shortcut.weight' in p:
        x = p.conv('nin_shortcut', x)
    return x + h


def _vae_attn(p: P, x):
    # single-head attention over h*w tokens; q-chunked via _attention for
    # the same HBM reason as the UNet (a 1024px page is 16384 VAE mid
    # tokens)
    n, h, w, c = x.shape
    xn = _gn(p, 'norm', x)
    q = p.conv('q', xn).reshape(n, h * w, c)
    k = p.conv('k', xn).reshape(n, h * w, c)
    v = p.conv('v', xn).reshape(n, h * w, c)
    out = _attention(q, k, v, heads=1)
    return x + p.conv('proj_out', out.reshape(n, h, w, c))


def vae_encode_moments(params: Dict, x: jax.Array,
                       cfg: SDConfig = SDConfig()) -> jax.Array:
    """(B, H, W, 3) in [-1,1] -> (B, H/8, W/8, 2*z) moments (mean|logvar)."""
    p = P(params).scope('first_stage_model')
    e = p.scope('encoder')
    h = e.conv('conv_in', x, padding=1)
    for level in range(len(cfg.vae_ch_mult)):
        for i in range(cfg.vae_num_res):
            h = _vae_resnet(e.scope(f'down.{level}.block.{i}'), h)
        if level != len(cfg.vae_ch_mult) - 1:
            # ldm pads asymmetrically (0,1,0,1) before the s2 conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            hp = e.scope(f'down.{level}.downsample')
            h = hp.conv('conv', h, stride=2)
    h = _vae_resnet(e.scope('mid.block_1'), h)
    h = _vae_attn(e.scope('mid.attn_1'), h)
    h = _vae_resnet(e.scope('mid.block_2'), h)
    h = _gn(e, 'norm_out', h)
    h = e.conv('conv_out', silu(h), padding=1)
    return p.conv('quant_conv', h)


def vae_sample(moments: jax.Array, rng: jax.Array,
               scale_factor: float) -> jax.Array:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    noise = jax.random.normal(rng, mean.shape, mean.dtype)
    return scale_factor * (mean + std * noise)


def vae_decode(params: Dict, z: jax.Array, cfg: SDConfig = SDConfig()
               ) -> jax.Array:
    """(B, h, w, z) scaled latent -> (B, 8h, 8w, 3) in [-1,1]."""
    p = P(params).scope('first_stage_model')
    z = z / cfg.scale_factor
    z = p.conv('post_quant_conv', z)
    d = p.scope('decoder')
    h = d.conv('conv_in', z, padding=1)
    h = _vae_resnet(d.scope('mid.block_1'), h)
    h = _vae_attn(d.scope('mid.attn_1'), h)
    h = _vae_resnet(d.scope('mid.block_2'), h)
    for level in reversed(range(len(cfg.vae_ch_mult))):
        for i in range(cfg.vae_num_res + 1):
            h = _vae_resnet(d.scope(f'up.{level}.block.{i}'), h)
        if level != 0:
            h = interpolate_nearest(h, 2)
            h = d.scope(f'up.{level}.upsample').conv('conv', h, padding=1)
    h = _gn(d, 'norm_out', h)
    return d.conv('conv_out', silu(h), padding=1)


# --------------------------------------------------------------------------
# CLIP text encoder (ViT-L/14 text tower)
# --------------------------------------------------------------------------

def clip_text_forward(params: Dict, tokens: jax.Array,
                      cfg: SDConfig = SDConfig()) -> jax.Array:
    """(B, L) int tokens -> (B, L, width) final hidden states
    (FrozenCLIPEmbedder uses last_hidden_state)."""
    p = P(params).scope('cond_stage_model.transformer.text_model')
    x = p['embeddings.token_embedding.weight'][tokens]
    pos = p['embeddings.position_embedding.weight'][:tokens.shape[1]]
    x = x + pos[None]
    L = tokens.shape[1]
    causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    for layer in range(cfg.text_layers):
        lp = p.scope(f'encoder.layers.{layer}')
        xn = lp.ln('layer_norm1', x)
        ap = lp.scope('self_attn')
        b, l, c = xn.shape
        hd = c // cfg.text_heads
        q = ap.dense('q_proj', xn).reshape(b, l, cfg.text_heads, hd)
        k = ap.dense('k_proj', xn).reshape(b, l, cfg.text_heads, hd)
        v = ap.dense('v_proj', xn).reshape(b, l, cfg.text_heads, hd)
        scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * (hd ** -.5)
        scores = scores + causal[None, None]
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', w, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        x = x + ap.dense('out_proj', out.reshape(b, l, c))
        xn = lp.ln('layer_norm2', x)
        x = x + lp.scope('mlp').dense('fc2',
                                      quick_gelu(lp.scope('mlp').dense(
                                          'fc1', xn)))
    return p.ln('final_layer_norm', x)


# --------------------------------------------------------------------------
# DDIM schedule (uniform discretize, eta 0) — reference ddim.py semantics
# --------------------------------------------------------------------------

def make_ddim_schedule(num_steps: int, num_train_steps: int = 1000,
                       linear_start: float = 0.00085,
                       linear_end: float = 0.0120) -> Dict[str, np.ndarray]:
    betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                        num_train_steps, dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    c = num_train_steps // num_steps
    ddim_timesteps = np.arange(0, num_steps) * c + 1
    ddim_alphas = alphas_cumprod[ddim_timesteps]
    ddim_alphas_prev = np.concatenate(
        [[alphas_cumprod[0]], alphas_cumprod[ddim_timesteps[:-1]]])
    return {
        'alphas_cumprod': alphas_cumprod.astype(np.float32),
        'timesteps': ddim_timesteps.astype(np.int32),
        'alphas': ddim_alphas.astype(np.float32),
        'alphas_prev': ddim_alphas_prev.astype(np.float32),
        'sqrt_one_minus_alphas': np.sqrt(1 - ddim_alphas).astype(np.float32),
    }


# --------------------------------------------------------------------------
# random init (tiny smoke tests / offline fallback)
# --------------------------------------------------------------------------

def init_params(cfg: SDConfig = SDConfig.tiny(), seed: int = 11,
                dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(seed)
    params: Dict = {}

    def conv(key, kh, kw, ci, co):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, ci, co).astype(np.float32)
            * np.sqrt(2.0 / (kh * kw * ci)), dtype)
        params[key + '.bias'] = jnp.zeros((co,), dtype)

    def dense(key, i, o):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(i, o).astype(np.float32) / np.sqrt(i), dtype)
        params[key + '.bias'] = jnp.zeros((o,), dtype)

    def norm(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)

    mc = cfg.model_channels
    u = 'model.diffusion_model'
    dense(f'{u}.time_embed.0', mc, mc * 4)
    dense(f'{u}.time_embed.2', mc * 4, mc * 4)
    conv(f'{u}.input_blocks.0.0', 3, 3, cfg.in_channels, mc)

    def res_keys(pre, ci, co):
        norm(f'{pre}.in_layers.0', ci)
        conv(f'{pre}.in_layers.2', 3, 3, ci, co)
        dense(f'{pre}.emb_layers.1', mc * 4, co)
        norm(f'{pre}.out_layers.0', co)
        conv(f'{pre}.out_layers.3', 3, 3, co, co)
        if ci != co:
            conv(f'{pre}.skip_connection', 1, 1, ci, co)

    def st_keys(pre, c):
        norm(f'{pre}.norm', c)
        conv(f'{pre}.proj_in', 1, 1, c, c)
        tb = f'{pre}.transformer_blocks.0'
        for nrm in ('norm1', 'norm2', 'norm3'):
            norm(f'{tb}.{nrm}', c)
        for attn, kv in (('attn1', c), ('attn2', cfg.context_dim)):
            params[f'{tb}.{attn}.to_q.weight'] = jnp.asarray(
                rs.randn(c, c).astype(np.float32) / np.sqrt(c), dtype)
            params[f'{tb}.{attn}.to_k.weight'] = jnp.asarray(
                rs.randn(kv, c).astype(np.float32) / np.sqrt(kv), dtype)
            params[f'{tb}.{attn}.to_v.weight'] = jnp.asarray(
                rs.randn(kv, c).astype(np.float32) / np.sqrt(kv), dtype)
            dense(f'{tb}.{attn}.to_out.0', c, c)
        dense(f'{tb}.ff.net.0.proj', c, c * 8)
        dense(f'{tb}.ff.net.2', c * 4, c)
        conv(f'{pre}.proj_out', 1, 1, c, c)

    ch = mc
    ds = 1
    idx = 1
    in_chs = [mc]
    for level, mult in enumerate(cfg.channel_mult):
        co = mc * mult
        for _ in range(cfg.num_res_blocks):
            res_keys(f'{u}.input_blocks.{idx}.0', ch, co)
            if ds in cfg.attention_resolutions:
                st_keys(f'{u}.input_blocks.{idx}.1', co)
            ch = co
            in_chs.append(ch)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            conv(f'{u}.input_blocks.{idx}.0.op', 3, 3, ch, ch)
            in_chs.append(ch)
            idx += 1
            ds *= 2
    res_keys(f'{u}.middle_block.0', ch, ch)
    st_keys(f'{u}.middle_block.1', ch)
    res_keys(f'{u}.middle_block.2', ch, ch)
    idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        co = mc * mult
        for i in range(cfg.num_res_blocks + 1):
            res_keys(f'{u}.output_blocks.{idx}.0', ch + in_chs.pop(), co)
            sub = 1
            if ds in cfg.attention_resolutions:
                st_keys(f'{u}.output_blocks.{idx}.{sub}', co)
                sub += 1
            if level != 0 and i == cfg.num_res_blocks:
                conv(f'{u}.output_blocks.{idx}.{sub}.conv', 3, 3, co, co)
                ds //= 2
            ch = co
            idx += 1
    norm(f'{u}.out.0', mc)
    conv(f'{u}.out.2', 3, 3, mc, cfg.out_channels)

    # VAE
    v = 'first_stage_model'
    vc = cfg.vae_channels

    def vres(pre, ci, co):
        norm(f'{pre}.norm1', ci)
        conv(f'{pre}.conv1', 3, 3, ci, co)
        norm(f'{pre}.norm2', co)
        conv(f'{pre}.conv2', 3, 3, co, co)
        if ci != co:
            conv(f'{pre}.nin_shortcut', 1, 1, ci, co)

    def vattn(pre, c):
        norm(f'{pre}.norm', c)
        for nm in ('q', 'k', 'v', 'proj_out'):
            conv(f'{pre}.{nm}', 1, 1, c, c)

    conv(f'{v}.encoder.conv_in', 3, 3, 3, vc)
    ch = vc
    for level, mult in enumerate(cfg.vae_ch_mult):
        co = vc * mult
        for i in range(cfg.vae_num_res):
            vres(f'{v}.encoder.down.{level}.block.{i}', ch, co)
            ch = co
        if level != len(cfg.vae_ch_mult) - 1:
            conv(f'{v}.encoder.down.{level}.downsample.conv', 3, 3, ch, ch)
    vres(f'{v}.encoder.mid.block_1', ch, ch)
    vattn(f'{v}.encoder.mid.attn_1', ch)
    vres(f'{v}.encoder.mid.block_2', ch, ch)
    norm(f'{v}.encoder.norm_out', ch)
    conv(f'{v}.encoder.conv_out', 3, 3, ch, 2 * cfg.z_channels)
    conv(f'{v}.quant_conv', 1, 1, 2 * cfg.z_channels, 2 * cfg.z_channels)
    conv(f'{v}.post_quant_conv', 1, 1, cfg.z_channels, cfg.z_channels)
    conv(f'{v}.decoder.conv_in', 3, 3, cfg.z_channels, ch)
    vres(f'{v}.decoder.mid.block_1', ch, ch)
    vattn(f'{v}.decoder.mid.attn_1', ch)
    vres(f'{v}.decoder.mid.block_2', ch, ch)
    for level in reversed(range(len(cfg.vae_ch_mult))):
        co = vc * cfg.vae_ch_mult[level]
        for i in range(cfg.vae_num_res + 1):
            vres(f'{v}.decoder.up.{level}.block.{i}', ch, co)
            ch = co
        if level != 0:
            conv(f'{v}.decoder.up.{level}.upsample.conv', 3, 3, ch, ch)
    norm(f'{v}.decoder.norm_out', ch)
    conv(f'{v}.decoder.conv_out', 3, 3, ch, 3)

    # CLIP text
    t = 'cond_stage_model.transformer.text_model'
    tw = cfg.text_width
    params[f'{t}.embeddings.token_embedding.weight'] = jnp.asarray(
        rs.randn(cfg.vocab_size, tw).astype(np.float32) * 0.02, dtype)
    params[f'{t}.embeddings.position_embedding.weight'] = jnp.asarray(
        rs.randn(cfg.max_tokens, tw).astype(np.float32) * 0.01, dtype)
    for layer in range(cfg.text_layers):
        pre = f'{t}.encoder.layers.{layer}'
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            dense(f'{pre}.self_attn.{proj}', tw, tw)
        norm(f'{pre}.layer_norm1', tw)
        norm(f'{pre}.layer_norm2', tw)
        dense(f'{pre}.mlp.fc1', tw, tw * 4)
        dense(f'{pre}.mlp.fc2', tw * 4, tw)
    norm(f'{t}.final_layer_norm', tw)
    return params


EMBEDDING_PATTERNS = (
    r'cond_stage_model\.transformer\.text_model\.embeddings\..*\.weight',
)
