"""48px autoregressive OCR (default OCR backend) — TPU-native.

Architecture contract (checkpoint ``ocr_ar_48px.ckpt``): reference
``ocr/model_48px.py:183-855`` + ``ocr/xpos_relative_position.py`` — ConvNeXt
feature extractor (48px tall strips → 1×W/4 tokens of dim 320), 4 pre-LN
transformer encoder layers and 5 decoder layers with XPOS rotary attention,
weight-tied char head, and per-timestep fg/bg color heads.

TPU redesign of the decode loop (reference ``infer_beam_batch_tensor``
:678-801 recomputes every key/value over the whole prefix each step and
compacts live hypotheses on host):

* proper per-layer K/V caches — exact, because XPOS's length-dependent
  centering cancels between q (scale) and k (1/scale), leaving a pure
  relative-position decay s^((i-j)/base);
* cross-attention K/V computed once per sequence;
* a fixed-shape ``lax.while_loop`` over steps with finished-beam masking and
  per-sample result latching (early exit when every sample has
  ``max_finished_hypos`` finished beams);
* the whole chunk (16 crops × 5 beams) advances in lockstep — no host
  round-trips inside the loop.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .functional import P, conv2d, gelu, layer_norm, linear, relu

EMBD_DIM = 320
N_HEADS = 4
HEAD_DIM = EMBD_DIM // N_HEADS
N_ENCODERS = 4
N_DECODERS = 5
FF_DIM = 2048            # torch TransformerEncoder/DecoderLayer default
XPOS_SCALE_BASE = EMBD_DIM  # reference passes embed_dim as scale_base

START_TOK, END_TOK, PAD_TOK = 1, 2, 0


# --------------------------------------------------------------------------
# XPOS rotary position embedding (reference xpos_relative_position.py:8-72)
# --------------------------------------------------------------------------

def _xpos_scale_vec() -> np.ndarray:
    # (arange(0, head_dim, 2) + 0.4*head_dim) / (1.4*head_dim)
    return ((np.arange(0, HEAD_DIM, 2) + 0.4 * HEAD_DIM)
            / (1.4 * HEAD_DIM)).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _xpos_sincos(length: int) -> Tuple[np.ndarray, np.ndarray]:
    """(sin, cos) rotation tables for absolute positions 0..length-1,
    shape (length, head_dim/2). Matches fixed_pos_embedding: inv_freq uses
    dim = head_dim/2 (the reference feeds the scale matrix whose width is
    head_dim/2 into fixed_pos_embedding)."""
    half = HEAD_DIM // 2
    pos = np.arange(length, dtype=np.float32)
    inv_freq = 1.0 / (10000 ** (np.arange(half, dtype=np.float32) / half))
    sinusoid = pos[:, None] * inv_freq[None, :]
    return np.sin(sinusoid), np.cos(sinusoid)


_XPOS_MAX_POS = 4096


def apply_xpos(x: jax.Array, rot_positions: jax.Array,
               scale_exponents: jax.Array, downscale: bool) -> jax.Array:
    """XPOS rotary embedding over (..., L, head_dim).

    Args:
      rot_positions: (L,) int — absolute positions for the sin/cos rotation.
      scale_exponents: (L,) — exponent e in s^(e/scale_base) for the decay
        (the reference centers these per call; centers must be replicated
        exactly for cross-attention where q and k centers differ).
      downscale: negate the exponent (applied to keys).
    """
    sin_np, cos_np = _xpos_sincos(_XPOS_MAX_POS)
    sin = jnp.asarray(sin_np)[rot_positions]
    cos = jnp.asarray(cos_np)[rot_positions]
    s = jnp.asarray(_xpos_scale_vec())                        # (hd/2,)
    exp = scale_exponents.astype(jnp.float32) / XPOS_SCALE_BASE
    if downscale:
        exp = -exp
    scale = jnp.power(s[None, :], exp[:, None])               # (L, hd/2)
    sin = jnp.repeat(sin * scale, 2, axis=-1).astype(x.dtype)
    cos = jnp.repeat(cos * scale, 2, axis=-1).astype(x.dtype)
    return _rotate_mix(x, sin, cos)


def _rotate_mix(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rotated = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos + rotated * sin


def xpos_step_tables(max_len: int) -> dict:
    """Per-step XPOS sin/cos tables for the three decode-loop variants
    (self q, self k, cross q), precomputed in numpy so the while_loop body
    reduces each apply_xpos to one row gather + the rotate mix.

    Row t holds exactly what apply_xpos would compute for step t:
      self q:  positions=t, exponents=+t   (upscale)
      self k:  positions=t, exponents=-t   (downscale)
      cross q: positions=t, exponents=+((t+1)//2 - 1)
    """
    sin_np, cos_np = _xpos_sincos(_XPOS_MAX_POS)
    steps = np.arange(max_len)
    sin = sin_np[steps]                                        # (S, hd/2)
    cos = cos_np[steps]
    s = _xpos_scale_vec()[None, :]                             # (1, hd/2)

    def table(exponents, negate):
        e = exponents.astype(np.float32) / XPOS_SCALE_BASE
        if negate:
            e = -e
        scale = np.power(s, e[:, None])                        # (S, hd/2)
        return (np.repeat(sin * scale, 2, axis=-1),
                np.repeat(cos * scale, 2, axis=-1))

    sq_sin, sq_cos = table(steps, False)
    sk_sin, sk_cos = table(steps, True)
    cq_sin, cq_cos = table((steps + 1) // 2 - 1, False)
    return {
        'self_q': (jnp.asarray(sq_sin), jnp.asarray(sq_cos)),
        'self_k': (jnp.asarray(sk_sin), jnp.asarray(sk_cos)),
        'cross_q': (jnp.asarray(cq_sin), jnp.asarray(cq_cos)),
    }


# --------------------------------------------------------------------------
# ConvNeXt feature extractor (reference model_48px.py:183-280)
# --------------------------------------------------------------------------

def _pw_dot() -> bool:
    """Backbone pw convs as explicit matmuls (x @ w[0,0]) instead of 1x1
    conv_general_dilated. MEASURED NEUTRAL on v5e (r4,
    ocr_backbone_pwdot_ab: 11.6/11.9 vs 11.6/11.7 ms per 24-crop chunk) —
    XLA already lowers 1x1 convs to the same dots; the backbone's distance
    from roofline is NOT the conv-vs-dot lowering. Bit-exact either way."""
    import os
    return os.environ.get('MIT_TPU_OCR_PW_DOT', '0') == '1'


def _pw(p: P, name: str, x: jax.Array) -> jax.Array:
    if not _pw_dot():
        return p.conv(name, x)
    w = p[f'{name}.weight']  # (1, 1, Cin, Cout)
    out = jax.lax.dot_general(
        x, w[0, 0].astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if f'{name}.bias' in p:
        out = out + p[f'{name}.bias'].astype(x.dtype)
    return out


def _convnext_block(p: P, x: jax.Array, ks: int) -> jax.Array:
    inp = x
    dim = x.shape[-1]
    x = p.conv('dwconv', x, padding=ks // 2, groups=dim)
    if 'norm.running_mean' in p:      # absent once fold_bn has run
        x = p.bn('norm', x, eps=1e-6)
    x = _pw(p, 'pwconv1', x)
    x = gelu(x)
    x = _pw(p, 'pwconv2', x)
    # torch gamma shape (1, dim, 1, 1) -> broadcast over NHWC channels
    x = x * p['gamma'].reshape(-1).astype(x.dtype)
    return inp + x


def _conv_bn_relu(p: P, idx0: int, x: jax.Array, stride, padding=0) -> jax.Array:
    sh, sw = stride if isinstance(stride, tuple) else (stride, stride)
    w = p[f'{idx0}.weight']
    b = p[f'{idx0}.bias'] if f'{idx0}.bias' in p else None
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (sh, sw),
        [(padding, padding), (padding, padding)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    if f'{idx0 + 1}.running_mean' in p:
        out = p.bn(str(idx0 + 1), out)
    return relu(out)


def convnext_features(p: P, x: jax.Array) -> jax.Array:
    """(N, 48, W, 3) → (N, W/4, 320) memory tokens."""
    s = p.scope('stem')
    x = s.conv('0', x, padding=3)
    if '1.running_mean' in s:
        x = s.bn('1', x)
    x = relu(x)
    x = _conv_bn_relu(s, 3, x, 2)
    x = s.conv('6', x, padding=1)
    if '7.running_mean' in s:
        x = s.bn('7', x)
    x = relu(x)
    for i in range(4):
        x = _convnext_block(p.scope(f'block1.{i}'), x, 7)
    x = _conv_bn_relu(p.scope('down1'), 0, x, 2)
    for i in range(12):
        x = _convnext_block(p.scope(f'block2.{i}'), x, 7)
    x = _conv_bn_relu(p.scope('down2'), 0, x, (2, 1))
    for i in range(10):
        x = _convnext_block(p.scope(f'block3.{i}'), x, 5)
    x = _conv_bn_relu(p.scope('down3'), 0, x, (2, 1))
    for i in range(8):
        x = _convnext_block(p.scope(f'block4.{i}'), x, 3)
    # down4: (3,1) kernel, stride 1, no padding: 3 rows -> 1 row
    x = _conv_bn_relu(p.scope('down4'), 0, x, (1, 1))
    return x[:, 0, :, :]  # (N, W', C)


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------

def _split_heads(x: jax.Array) -> jax.Array:
    """(N, L, E) -> (N, H, L, hd)"""
    n, l, _ = x.shape
    return x.reshape(n, l, N_HEADS, HEAD_DIM).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    n, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n, l, h * hd)


def xpos_attention(p: P, query: jax.Array, key: jax.Array, value: jax.Array,
                   key_padding_mask: jax.Array = None) -> jax.Array:
    """Full (non-cached) self-attention with XPOS, (N, L, E) inputs.

    Matches reference XposMultiheadAttention.forward (model_48px.py:327-395)
    with q_offset = k_offset = 0: both sides centered at L//2.
    """
    L = key.shape[1]
    pos = jnp.arange(L)
    # reference min_pos = -(L)//2 floors toward -inf: center = ceil(L/2)
    exp = pos - (L + 1) // 2
    q = p.dense('q_proj', query) * (HEAD_DIM ** -0.5)
    k = p.dense('k_proj', key)
    v = p.dense('v_proj', value)
    q, k, v = _split_heads(q), _split_heads(k), _split_heads(v)
    k = apply_xpos(k, pos, exp, downscale=True)
    q = apply_xpos(q, pos, exp, downscale=False)
    scores = jnp.einsum('nhqd,nhkd->nhqk', q, k,
                        preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf,
                           scores)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum('nhqk,nhkd->nhqd', weights, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return p.dense('out_proj', _merge_heads(out))


def _ff_block(p: P, x: jax.Array) -> jax.Array:
    return p.dense('linear2', relu(p.dense('linear1', x)))


def encoder_forward(params: Dict, memory: jax.Array,
                    key_padding_mask: jax.Array) -> jax.Array:
    """4 pre-LN encoder layers (reference OCR.encoder_forward)."""
    p = P(params)
    x = memory
    for i in range(N_ENCODERS):
        lp = p.scope(f'encoders.{i}')
        x = x + xpos_attention(lp.scope('self_attn'), lp.ln('norm1', x),
                               lp.ln('norm1', x), lp.ln('norm1', x),
                               key_padding_mask)
        x = x + _ff_block(lp, lp.ln('norm2', x))
    return x


# --------------------------------------------------------------------------
# Decoder with K/V caches
# --------------------------------------------------------------------------

class DecodeCaches(NamedTuple):
    self_k: jax.Array    # (L_dec, N, H, S, hd)
    self_v: jax.Array    # (L_dec, N, H, S, hd)
    mem_k: jax.Array     # (L_dec, N, H, M, hd) — xpos applied
    mem_v: jax.Array     # (L_dec, N, H, M, hd)
    out: jax.Array       # (N, S, E) last-layer outputs (for color heads)


def init_caches(params: Dict, memory: jax.Array, n: int, max_len: int
                ) -> DecodeCaches:
    p = P(params)
    m = memory.shape[1]
    mem_pos = jnp.arange(m)
    # reference centers memory keys at ceil(M/2) (python -(M)//2 flooring)
    mem_exp = mem_pos - (m + 1) // 2
    mem_ks, mem_vs = [], []
    for l in range(N_DECODERS):
        lp = p.scope(f'decoders.{l}.multihead_attn')
        k = _split_heads(lp.dense('k_proj', memory))
        v = _split_heads(lp.dense('v_proj', memory))
        mem_ks.append(apply_xpos(k, mem_pos, mem_exp, downscale=True))
        mem_vs.append(v)
    dtype = memory.dtype
    return DecodeCaches(
        self_k=jnp.zeros((N_DECODERS, n, N_HEADS, max_len, HEAD_DIM), dtype),
        self_v=jnp.zeros((N_DECODERS, n, N_HEADS, max_len, HEAD_DIM), dtype),
        mem_k=jnp.stack(mem_ks),
        mem_v=jnp.stack(mem_vs),
        out=jnp.zeros((n, max_len, EMBD_DIM), dtype),
    )


def decode_step(params: Dict, caches: DecodeCaches, token: jax.Array,
                step: jax.Array, memory_mask: jax.Array,
                xpos_tables: Optional[dict] = None
                ) -> Tuple[jax.Array, DecodeCaches]:
    """One decoder step for (N,) tokens at position ``step``.

    Returns (N, E) outputs and updated caches. ``xpos_tables`` (from
    xpos_step_tables) turns each in-loop apply_xpos into a row gather.
    """
    p = P(params)
    embd = P(params)['embd.weight']
    tgt = embd[token][:, None, :].astype(caches.mem_k.dtype)  # (N, 1, E)
    n = tgt.shape[0]
    max_len = caches.self_k.shape[3]
    step_positions = jnp.full((1,), step, dtype=jnp.int32)
    # decoder self-attn: score decay s^((step-j)/base) — realized with
    # uncentered exponents (q: +step, k: -j), which matches the reference's
    # per-step recentered values in the q·k product exactly
    step_exp = step_positions
    # cross-attn q: the reference's 1-token window centers at
    # ceil((1+step)/2), leaving exponent floor((1+step)/2) - 1
    cross_exp = (step_positions + 1) // 2 - 1
    # positions mask for self-attention: attend to 0..step
    pos_idx = jnp.arange(max_len)
    self_mask = pos_idx[None, :] > step  # (1, S) True = masked

    if xpos_tables is not None:
        def mk(name):
            sin_t, cos_t = xpos_tables[name]
            sin = sin_t[step].astype(caches.mem_k.dtype)
            cos = cos_t[step].astype(caches.mem_k.dtype)
            return lambda x: _rotate_mix(x, sin, cos)
        xpos_self_q, xpos_self_k, xpos_cross_q = (
            mk('self_q'), mk('self_k'), mk('cross_q'))
    else:
        xpos_self_q = lambda x: apply_xpos(x, step_positions, step_exp,
                                           downscale=False)
        xpos_self_k = lambda x: apply_xpos(x, step_positions, step_exp,
                                           downscale=True)
        xpos_cross_q = lambda x: apply_xpos(x, step_positions, cross_exp,
                                            downscale=False)

    self_k, self_v = caches.self_k, caches.self_v
    for l in range(N_DECODERS):
        lp = p.scope(f'decoders.{l}')
        ap = lp.scope('self_attn')
        x_norm = lp.ln('norm1', tgt)
        # fused qkv: one (E, 3E) matmul per layer instead of three
        # (fused weights precomputed by fuse_qkv_params before the loop)
        if f'decoders.{l}.self_attn.qkv_weight' in p:
            wqkv = ap['qkv_weight']
            bqkv = ap['qkv_bias']
        else:
            wqkv = jnp.concatenate([ap['q_proj.weight'],
                                    ap['k_proj.weight'],
                                    ap['v_proj.weight']], axis=1)
            bqkv = jnp.concatenate([ap['q_proj.bias'], ap['k_proj.bias'],
                                    ap['v_proj.bias']])
        qkv = linear(x_norm, wqkv, bqkv)
        q = _split_heads(qkv[..., :EMBD_DIM] * (HEAD_DIM ** -0.5))
        k_new = _split_heads(qkv[..., EMBD_DIM:2 * EMBD_DIM])
        v_new = _split_heads(qkv[..., 2 * EMBD_DIM:])
        q = xpos_self_q(q)
        k_new = xpos_self_k(k_new)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_new[None], (l, 0, 0, step, 0))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_new[None], (l, 0, 0, step, 0))
        scores = jnp.einsum('nhqd,nhkd->nhqk', q, self_k[l],
                            preferred_element_type=jnp.float32)
        scores = jnp.where(self_mask[None, None, :, :], -jnp.inf, scores)
        w = jax.nn.softmax(scores, axis=-1).astype(tgt.dtype)
        attn = jnp.einsum('nhqk,nhkd->nhqd', w, self_v[l],
                          preferred_element_type=jnp.float32).astype(tgt.dtype)
        tgt = tgt + ap.dense('out_proj', _merge_heads(attn))

        # cross attention
        cp = lp.scope('multihead_attn')
        xq_in = lp.ln('norm2', tgt)
        q2 = _split_heads(cp.dense('q_proj', xq_in) * (HEAD_DIM ** -0.5))
        q2 = xpos_cross_q(q2)
        scores2 = jnp.einsum('nhqd,nhkd->nhqk', q2, caches.mem_k[l],
                             preferred_element_type=jnp.float32)
        scores2 = jnp.where(memory_mask[:, None, None, :], -jnp.inf, scores2)
        w2 = jax.nn.softmax(scores2, axis=-1).astype(tgt.dtype)
        attn2 = jnp.einsum('nhqk,nhkd->nhqd', w2, caches.mem_v[l],
                           preferred_element_type=jnp.float32).astype(tgt.dtype)
        tgt = tgt + cp.dense('out_proj', _merge_heads(attn2))

        tgt = tgt + _ff_block(lp, lp.ln('norm3', tgt))

    out = jax.lax.dynamic_update_slice(
        caches.out, tgt, (0, step, 0))
    return tgt[:, 0, :], DecodeCaches(self_k, self_v, caches.mem_k,
                                      caches.mem_v, out)


# --------------------------------------------------------------------------
# Stacked fused decode path (the production beam_decode step)
#
# The while_loop step is dispatch-bound (~115 small ops x ~5 us sequencer
# overhead each on v5e), so the fused path cuts op count:
#   * XPOS rotations move to the WEIGHT side: one set of elementwise ops
#     rotates all 5 layers' stacked QKV / cross-Q projections per step,
#     replacing per-layer activation rotates (rotation is linear:
#     R(Wx + b) = (W R^T)x + R b, and R acts on the output dim);
#   * the attention head-dim scale folds into the same rotation tables;
#   * K and V live in ONE cache (L, N, S, 2E): one dynamic_update_slice and
#     one beam gather per step instead of two;
#   * tokens stay (N, E) 2D throughout (no length-1 axis reshuffling);
#   * the char head exposes top-k + logsumexp instead of materializing the
#     full (N, V) log_softmax.
# --------------------------------------------------------------------------

class StackedCaches(NamedTuple):
    # K/V stay separate and HEAD-MAJOR (L, N, H, S, hd): a combined
    # (L, N, S, 2E) cache was measured 5x slower per step — the k/v lane
    # split at 320/640 is misaligned (2.5 x 128 lanes) and the S-major
    # layout forces a (N,S,H,hd)->(N,H,S,hd) transpose in every layer.
    self_k: jax.Array  # (L, N, H, S, hd)
    self_v: jax.Array  # (L, N, H, S, hd)
    mem_k: jax.Array   # (L, N, H, M, hd), xpos applied
    mem_v: jax.Array   # (L, N, H, M, hd)
    out: jax.Array     # (N, S, E) last-layer outputs (for color heads)


def stack_decoder_params(params: Dict) -> Dict[str, jax.Array]:
    """Stack the 5 decoder layers' weights along a leading axis so the
    per-step rotation and the layer loop index into single arrays."""
    p = P(params)

    def st(fmt):
        return jnp.stack([p[fmt.format(l=l)] for l in range(N_DECODERS)])

    sp = {}
    if 'decoders.0.self_attn.qkv_weight' in params:
        sp['wqkv'] = st('decoders.{l}.self_attn.qkv_weight')
        sp['bqkv'] = st('decoders.{l}.self_attn.qkv_bias')
    else:
        sp['wqkv'] = jnp.stack([jnp.concatenate(
            [p[f'decoders.{l}.self_attn.{proj}.weight']
             for proj in ('q_proj', 'k_proj', 'v_proj')], axis=1)
            for l in range(N_DECODERS)])
        sp['bqkv'] = jnp.stack([jnp.concatenate(
            [p[f'decoders.{l}.self_attn.{proj}.bias']
             for proj in ('q_proj', 'k_proj', 'v_proj')])
            for l in range(N_DECODERS)])
    sp['w_self_out'] = st('decoders.{l}.self_attn.out_proj.weight')
    sp['b_self_out'] = st('decoders.{l}.self_attn.out_proj.bias')
    sp['w_cross_q'] = st('decoders.{l}.multihead_attn.q_proj.weight')
    sp['b_cross_q'] = st('decoders.{l}.multihead_attn.q_proj.bias')
    sp['w_cross_out'] = st('decoders.{l}.multihead_attn.out_proj.weight')
    sp['b_cross_out'] = st('decoders.{l}.multihead_attn.out_proj.bias')
    for nrm in ('norm1', 'norm2', 'norm3'):
        sp[f'{nrm}_w'] = st(f'decoders.{{l}}.{nrm}.weight')
        sp[f'{nrm}_b'] = st(f'decoders.{{l}}.{nrm}.bias')
    sp['ff1_w'] = st('decoders.{l}.linear1.weight')
    sp['ff1_b'] = st('decoders.{l}.linear1.bias')
    sp['ff2_w'] = st('decoders.{l}.linear2.weight')
    sp['ff2_b'] = st('decoders.{l}.linear2.bias')
    return sp


def xpos_weight_tables(max_len: int) -> dict:
    """Per-step (S, E) sin/cos rows for weight-side rotation: the per-head
    (hd,) tables tiled across heads, with the attention scale folded into
    the self/cross q variants."""
    base = xpos_step_tables(max_len)
    scale = HEAD_DIM ** -0.5

    def tile(pair, factor=1.0):
        sin, cos = pair
        return (jnp.tile(sin, (1, N_HEADS)) * factor,
                jnp.tile(cos, (1, N_HEADS)) * factor)

    return {
        'self_q': tile(base['self_q'], scale),
        'self_k': tile(base['self_k']),
        'cross_q': tile(base['cross_q'], scale),
    }


def init_stacked_caches(params: Dict, memory: jax.Array, n: int,
                        max_len: int) -> StackedCaches:
    base = init_caches(params, memory, n, max_len)
    dtype = memory.dtype
    shape = (N_DECODERS, n, N_HEADS, max_len, HEAD_DIM)
    return StackedCaches(
        self_k=jnp.zeros(shape, dtype), self_v=jnp.zeros(shape, dtype),
        mem_k=base.mem_k, mem_v=base.mem_v,
        out=jnp.zeros((n, max_len, EMBD_DIM), dtype))


def decode_step_stacked(params: Dict, sp: Dict, caches: StackedCaches,
                        token: jax.Array, step: jax.Array,
                        memory_mask: jax.Array, wtab: dict
                        ) -> Tuple[jax.Array, StackedCaches]:
    """Fused decoder step over (N,) tokens; returns ((N, E), caches)."""
    embd = params['embd.weight']
    tgt = embd[token].astype(caches.mem_k.dtype)              # (N, E)
    n = tgt.shape[0]
    max_len = caches.self_k.shape[3]
    dt = tgt.dtype

    def row(name):
        sin_t, cos_t = wtab[name]
        return sin_t[step].astype(dt), cos_t[step].astype(dt)

    sin_q, cos_q = row('self_q')
    sin_k, cos_k = row('self_k')
    sin_c, cos_c = row('cross_q')

    # weight-side rotation for ALL layers at once
    wqkv = sp['wqkv']
    wq = _rotate_mix(wqkv[..., :EMBD_DIM], sin_q, cos_q)
    wk = _rotate_mix(wqkv[..., EMBD_DIM:2 * EMBD_DIM], sin_k, cos_k)
    wqkv_rot = jnp.concatenate([wq, wk, wqkv[..., 2 * EMBD_DIM:]], axis=-1)
    bqkv = sp['bqkv']
    bq = _rotate_mix(bqkv[..., :EMBD_DIM], sin_q, cos_q)
    bk = _rotate_mix(bqkv[..., EMBD_DIM:2 * EMBD_DIM], sin_k, cos_k)
    bqkv_rot = jnp.concatenate([bq, bk, bqkv[..., 2 * EMBD_DIM:]], axis=-1)
    wcq_rot = _rotate_mix(sp['w_cross_q'], sin_c, cos_c)
    bcq_rot = _rotate_mix(sp['b_cross_q'], sin_c, cos_c)

    pos_idx = jnp.arange(max_len)
    self_mask = pos_idx[None, None, :] > step                 # (1, 1, S)
    self_k, self_v = caches.self_k, caches.self_v

    for l in range(N_DECODERS):
        xn = layer_norm(tgt, sp['norm1_w'][l], sp['norm1_b'][l])
        qkv = linear(xn, wqkv_rot[l], bqkv_rot[l])            # (N, 3E)
        q = qkv[:, :EMBD_DIM].reshape(n, N_HEADS, HEAD_DIM)
        k_new = qkv[:, EMBD_DIM:2 * EMBD_DIM].reshape(n, N_HEADS, HEAD_DIM)
        v_new = qkv[:, 2 * EMBD_DIM:].reshape(n, N_HEADS, HEAD_DIM)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_new[None, :, :, None, :], (l, 0, 0, step, 0))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_new[None, :, :, None, :], (l, 0, 0, step, 0))
        scores = jnp.einsum('nhd,nhsd->nhs', q, self_k[l],
                            preferred_element_type=jnp.float32)
        scores = jnp.where(self_mask, -jnp.inf, scores)
        w = jax.nn.softmax(scores, axis=-1).astype(dt)
        attn = jnp.einsum('nhs,nhsd->nhd', w, self_v[l],
                          preferred_element_type=jnp.float32).astype(dt)
        tgt = tgt + linear(attn.reshape(n, EMBD_DIM),
                           sp['w_self_out'][l], sp['b_self_out'][l])

        xn2 = layer_norm(tgt, sp['norm2_w'][l], sp['norm2_b'][l])
        q2 = linear(xn2, wcq_rot[l], bcq_rot[l]).reshape(n, N_HEADS,
                                                         HEAD_DIM)
        scores2 = jnp.einsum('nhd,nhmd->nhm', q2, caches.mem_k[l],
                             preferred_element_type=jnp.float32)
        scores2 = jnp.where(memory_mask[:, None, :], -jnp.inf, scores2)
        w2 = jax.nn.softmax(scores2, axis=-1).astype(dt)
        attn2 = jnp.einsum('nhm,nhmd->nhd', w2, caches.mem_v[l],
                           preferred_element_type=jnp.float32).astype(dt)
        tgt = tgt + linear(attn2.reshape(n, EMBD_DIM),
                           sp['w_cross_out'][l], sp['b_cross_out'][l])

        xn3 = layer_norm(tgt, sp['norm3_w'][l], sp['norm3_b'][l])
        tgt = tgt + linear(relu(linear(xn3, sp['ff1_w'][l], sp['ff1_b'][l])),
                           sp['ff2_w'][l], sp['ff2_b'][l])

    out = jax.lax.dynamic_update_slice(caches.out, tgt[:, None, :],
                                       (0, step, 0))
    return tgt, StackedCaches(self_k, self_v, caches.mem_k, caches.mem_v,
                              out)


def char_topk(params: Dict, decoded: jax.Array, k: int,
              wout: Optional[jax.Array] = None
              ) -> Tuple[jax.Array, jax.Array]:
    """Top-k log-probs without materializing the (N, V) log_softmax:
    top-k on raw logits (same indices) + logsumexp correction. ``wout``
    is the pre-transposed (E, V) vocab matrix — hoisting the transpose
    out of the decode loop (XLA does not LICM large transposes out of
    while_loop bodies)."""
    p = P(params)
    h = gelu(p.dense('pred1.0', decoded))
    w = wout if wout is not None else p['embd.weight'].T
    logits = linear(h, w.astype(h.dtype),
                    p['pred.bias']).astype(jnp.float32)
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return vals - lse[:, None], idx


def fold_bn(params: Dict) -> Dict:
    """Fold every inference-mode backbone BatchNorm into the conv before it.

    The 24-crop backbone's ~30 conv fusions are Compute-bound with fused
    VPU epilogues (dwconv+bn+gelu+residual) serializing against the MXU
    (r4 xprof) — folding BN removes one scale+shift per conv from each
    epilogue. ``convnext_features`` detects folded params by the absence
    of ``*.running_mean`` keys. Same trick as ``lama.fold_bn``.
    """
    import numpy as _np

    out = dict(params)

    def sb(bn_key, eps):
        g = _np.asarray(params[f'{bn_key}.weight'], _np.float32)
        b = _np.asarray(params[f'{bn_key}.bias'], _np.float32)
        mu = _np.asarray(params[f'{bn_key}.running_mean'], _np.float32)
        var = _np.asarray(params[f'{bn_key}.running_var'], _np.float32)
        s = g / _np.sqrt(var + eps)
        for suffix in ('weight', 'bias', 'running_mean', 'running_var'):
            out.pop(f'{bn_key}.{suffix}', None)
        return s, b - mu * s

    def fold(conv_key, bn_key, eps=1e-5):
        if f'{bn_key}.running_mean' not in params:
            return
        s, t = sb(bn_key, eps)
        w = _np.asarray(params[f'{conv_key}.weight'], _np.float32)
        dt = np.asarray(params[f'{conv_key}.weight']).dtype
        out[f'{conv_key}.weight'] = jnp.asarray(
            (w * s[None, None, None, :]).astype(dt))
        old_b = _np.asarray(params.get(f'{conv_key}.bias', 0.0), _np.float32)
        out[f'{conv_key}.bias'] = jnp.asarray((old_b * s + t).astype(dt))

    bb = 'backbone'
    for c, b in (('stem.0', 'stem.1'), ('stem.3', 'stem.4'),
                 ('stem.6', 'stem.7'), ('down1.0', 'down1.1'),
                 ('down2.0', 'down2.1'), ('down3.0', 'down3.1'),
                 ('down4.0', 'down4.1')):
        fold(f'{bb}.{c}', f'{bb}.{b}')
    for name, nblk in (('block1', 4), ('block2', 12), ('block3', 10),
                       ('block4', 8)):
        for i in range(nblk):
            fold(f'{bb}.{name}.{i}.dwconv', f'{bb}.{name}.{i}.norm',
                 eps=1e-6)
    return out


def fuse_qkv_params(params: Dict) -> Dict:
    """Precompute fused decoder-self-attention QKV weights (one matmul per
    step instead of three inside the while_loop)."""
    out = dict(params)
    for l in range(N_DECODERS):
        pre = f'decoders.{l}.self_attn'
        if f'{pre}.q_proj.weight' in params:
            out[f'{pre}.qkv_weight'] = jnp.concatenate(
                [params[f'{pre}.q_proj.weight'],
                 params[f'{pre}.k_proj.weight'],
                 params[f'{pre}.v_proj.weight']], axis=1)
            out[f'{pre}.qkv_bias'] = jnp.concatenate(
                [params[f'{pre}.q_proj.bias'],
                 params[f'{pre}.k_proj.bias'],
                 params[f'{pre}.v_proj.bias']])
    return out


def char_logprobs(params: Dict, decoded: jax.Array,
                  wout: Optional[jax.Array] = None) -> jax.Array:
    p = P(params)
    h = gelu(p.dense('pred1.0', decoded))
    w = wout if wout is not None else p['embd.weight'].T
    logits = linear(h, w.astype(h.dtype), p['pred.bias'])
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def color_predictions(params: Dict, decoded: jax.Array):
    """decoded: (..., E) → (fg, bg, fg_ind, bg_ind)."""
    p = P(params)
    feats = relu(p.dense('color_pred1.0', decoded))
    return (p.dense('color_pred_fg', feats), p.dense('color_pred_bg', feats),
            p.dense('color_pred_fg_ind', feats),
            p.dense('color_pred_bg_ind', feats))


# --------------------------------------------------------------------------
# Pallas fused-kernel decode path (ops/pallas_decode): one kernel launch
# per step instead of ~115 XLA ops — measured 0.225 vs 0.590 ms/step at
# n=80, S=256 on v5e. Caches live step-major (L, S, NK, EP) so the kernel
# streams contiguous CH-row chunks, visiting only ceil(step/CH) chunks.
# --------------------------------------------------------------------------

class PallasCaches(NamedTuple):
    self_k: jax.Array   # (L, S_pad, NK, EP) bf16
    self_v: jax.Array   # (L, S_pad, NK, EP) bf16
    mem_k: jax.Array    # (L, M_pad, NK, EP) bf16 — mask on pad lane E
    mem_v: jax.Array    # (L, M_pad, NK, EP) bf16
    out: jax.Array      # (NK, S, E) last-layer outputs (color heads)


def _pallas_decode_mode() -> Optional[str]:
    """'compiled' / 'interpret' / None — MIT_TPU_OCR_PALLAS overrides
    (0/1/interpret); default: compiled on TPU backends, off on CPU."""
    env = os.environ.get('MIT_TPU_OCR_PALLAS', 'auto')
    if env == '0':
        return None
    if env == 'interpret':
        return 'interpret'
    if env == '1':
        return 'compiled'
    try:
        backend = jax.default_backend()
    except Exception:       # pragma: no cover - backend probe failure
        return None
    return 'compiled' if backend in ('tpu', 'axon') else None


def _pallas_harness(params: Dict, dtype, max_len: int,
                    interpret: bool = False) -> 'BeamHarness':
    from ..ops import pallas_decode as pd

    s_pad = -(-max_len // pd.CH) * pd.CH
    weights = pd.prepare_decode_weights(params)
    rots_tab = pd.prepare_rots(xpos_step_tables(max_len), N_HEADS)
    embd_p = pd.pad_e(params['embd.weight'].astype(jnp.bfloat16))
    # In-kernel char head measured SLOWER (59.3 vs 53.6 ms/chunk on v5e:
    # XLA's one (E,V) matmul beats chunked DMA'd matmuls) — opt-in only.
    kernel_charhead = (os.environ.get('MIT_TPU_OCR_KERNEL_CHARHEAD', '0')
                       == '1')
    # Fused char-head top-k kernel (ops/pallas_charhead): one launch
    # replaces the per-step XLA epilogue chain (pred1+gelu, (E,V) matmul,
    # top_k, logsumexp) without materializing (N, V) logits. Unlike the
    # in-kernel charhead above it runs as a SEPARATE pipelined launch.
    kernel_topk = (not kernel_charhead and os.environ.get(
        'MIT_TPU_OCR_KERNEL_TOPK', '1') == '1')
    # Fused beam gather: each streamed cache chunk is beam-permuted
    # in-kernel (one-hot matmul, exact) and written back — removing the
    # XLA per-step full-S cache gather (read+write of the whole KV cache)
    # and the k/v dynamic_update_slice.
    fused_gather = os.environ.get('MIT_TPU_OCR_FUSED_GATHER', '1') == '1'
    vocab = params['embd.weight'].shape[0]
    vp = -(-vocab // 128) * 128 if kernel_charhead else 0
    wout = params['embd.weight'].T

    def init(memory_b, nk, mask_b):
        m = memory_b.shape[1]
        m_pad = pd.round_m(m)
        base = init_caches(params, memory_b, nk, 1)   # mem K/V projections
        if m_pad != m:
            mask_b = jnp.concatenate(
                [mask_b, jnp.ones((nk, m_pad - m), bool)], axis=1)
        mem_k, mem_v = pd.prepare_mem(base.mem_k, base.mem_v, mask_b,
                                      m_pad=m_pad)
        return PallasCaches(
            self_k=jnp.zeros((pd.L, s_pad, nk, pd.EP), jnp.bfloat16),
            self_v=jnp.zeros((pd.L, s_pad, nk, pd.EP), jnp.bfloat16),
            mem_k=mem_k, mem_v=mem_v,
            out=jnp.zeros((nk, max_len, EMBD_DIM), dtype))

    def dstep(caches, tok, step, mask_b, parent=None):
        """Returns the per-step char LOGITS (computed in-kernel — the
        char head is part of the fused launch); the last-layer outputs
        feed the color-head cache inside."""
        nk = caches.out.shape[0]
        m_pad = caches.mem_k.shape[1]
        tgt = embd_p[tok]
        perm = None
        if fused_gather:
            if parent is None:
                parent = jnp.arange(nk)
            perm = jax.nn.one_hot(parent, nk, dtype=jnp.bfloat16)
        out, k_new, v_new, logits, self_k, self_v = pd.decode_step_pallas(
            step, tgt, rots_tab[step], weights,
            caches.self_k, caches.self_v, caches.mem_k, caches.mem_v,
            n=nk, s_len=s_pad, m_len=m_pad, vp=vp, perm=perm,
            fused_gather=fused_gather, interpret=interpret)
        if not fused_gather:
            # fused mode: the kernel already permuted + persisted the
            # cache rows (including position ``step``) in place
            self_k = jax.lax.dynamic_update_slice(
                caches.self_k, k_new[:, None], (0, step, 0, 0))
            self_v = jax.lax.dynamic_update_slice(
                caches.self_v, v_new[:, None], (0, step, 0, 0))
        out_e = out[:, :EMBD_DIM].astype(dtype)
        outc = jax.lax.dynamic_update_slice(
            caches.out, out_e[:, None], (0, step, 0))
        new_caches = caches._replace(self_k=self_k, self_v=self_v,
                                     out=outc)
        if kernel_charhead:
            return logits, new_caches
        if kernel_topk:
            # hand the EP-padded last-layer output straight to the fused
            # top-k kernel (its zero-padded pred1 rows annihilate any
            # garbage in the pad lanes)
            return out.astype(jnp.bfloat16), new_caches
        return out_e, new_caches

    def topk_from_logits(logits, k):
        vals, idx = jax.lax.top_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        return vals - lse[:, None], idx

    if kernel_charhead:
        char_lp = lambda logits: jax.nn.log_softmax(logits, axis=-1)
        char_tk = topk_from_logits
    elif kernel_topk:
        from ..ops.pallas_charhead import char_topk_fused, prepare_charhead
        w1p, b1p, wvp, bvp = prepare_charhead(params, ep=pd.EP)

        def char_tk(dec, k):
            nkr = dec.shape[0]
            pad = (-nkr) % 8
            if pad:
                dec = jnp.concatenate(
                    [dec, jnp.zeros((pad, dec.shape[1]), dec.dtype)])
            v, i = char_topk_fused(dec, w1p, b1p, wvp, bvp, k=k,
                                   interpret=interpret)
            return v[:nkr], i[:nkr]

        char_lp = lambda dec: char_logprobs(params, dec[:, :EMBD_DIM],
                                            wout)
    else:
        char_lp = lambda dec: char_logprobs(params, dec, wout)
        char_tk = lambda dec, k: char_topk(params, dec, k, wout)

    if fused_gather:
        # the kernel permutes self-K/V in place at the NEXT step; the
        # color-head output cache is deferred (run_beam row_src chain)
        # unless the eager legacy mode is forced
        if _defer_colors():
            cache_gather = lambda caches, idx: caches
        else:
            cache_gather = lambda caches, idx: caches._replace(
                out=caches.out[idx])
    else:
        cache_gather = lambda caches, idx: caches._replace(
            self_k=caches.self_k[:, :, idx],
            self_v=caches.self_v[:, :, idx],
            out=(caches.out if _defer_colors() else caches.out[idx]))
    return BeamHarness(
        init_caches=init,
        decode_step=dstep,
        char_logprobs=char_lp,
        char_topk=char_tk,
        cache_gather=cache_gather,
        cache_out=lambda caches: caches.out,
        embd_dim=EMBD_DIM,
        fused_gather=fused_gather)


# --------------------------------------------------------------------------
# Beam search (fixed shape, while_loop)
# --------------------------------------------------------------------------

def _defer_colors() -> bool:
    """Deferred color-cache reconstruction (default ON): the while_loop
    never gathers the (N*k, S, E) last-layer output cache by beam parent.
    Instead a tiny (N*k, S) int32 ``row_src`` matrix tracks which slot
    wrote each output row, and the winning beam's colors are assembled by
    ONE gather after the loop — bit-identical outputs, minus a multi-MB
    gather + latch per step (13 MB/step at S=256)."""
    return os.environ.get('MIT_TPU_OCR_DEFER_COLORS', '1') == '1'


class BeamState(NamedTuple):
    step: jax.Array          # scalar int32 — next write position
    out_idx: jax.Array       # (N*k, S+1) int32
    log_probs: jax.Array     # (N*k,) f32 — summed logprobs
    caches: 'DecodeCaches'   # beams share the N*k leading dim
    done: jax.Array          # (N,) bool — sample latched
    best_seq: jax.Array      # (N, S+1) int32 latched
    best_logprob: jax.Array  # (N,) f32 latched
    best_colors: jax.Array   # (N, S, E) latched last-layer outputs
                             # (eager legacy mode; (1,1,1) dummy when
                             # colors are deferred)
    parent: jax.Array        # (N*k,) int32 — last step's beam parents
                             # (identity until a selection happens; only
                             # consumed by fused_gather harnesses)
    row_src: jax.Array       # (N*k, S) int32 — slot that wrote each out
                             # row, permuted like out_idx (deferred mode;
                             # (1, 1) dummy in eager mode)
    best_row_src: jax.Array  # (N, S) int32 latched row sources


class BeamHarness(NamedTuple):
    """Model-specific hooks for the generic fixed-shape beam search, shared
    by the 48px and 32px autoregressive OCR decoders."""
    init_caches: 'callable'    # (memory_b (N*k,M,E), nk, mask_b) -> caches
    decode_step: 'callable'    # (caches, tok (N*k,), step, mask_b) -> (out, caches)
    char_logprobs: 'callable'  # (decoded (N*k,E)) -> (N*k, V) logprobs
    cache_gather: 'callable'   # (caches, beam_idx (N*k,)) -> caches
    cache_out: 'callable'      # (caches) -> (N*k, S, E) per-step outputs
    embd_dim: int
    # optional fused top-k over the char head (avoids materializing the
    # full log_softmax); falls back to char_logprobs + top_k when None
    char_topk: 'callable' = None
    # decode_step applies the beam-parent permutation in-kernel; run_beam
    # then passes the previous step's parents into decode_step and
    # cache_gather skips the self-KV gather
    fused_gather: bool = False


def run_beam(harness: BeamHarness, memory: jax.Array,
             memory_mask: jax.Array, n: int, beams_k: int, max_len: int,
             max_finished_hypos: int) -> BeamState:
    """Fixed-shape beam search over a while_loop with per-sample latching
    (semantics of reference infer_beam_batch_tensor :678-801, without the
    host-side hypothesis compaction)."""
    nk = n * beams_k
    memory_b = jnp.repeat(memory, beams_k, axis=0)
    memory_mask_b = jnp.repeat(memory_mask, beams_k, axis=0)
    caches = harness.init_caches(memory_b, nk, memory_mask_b)

    out_idx = jnp.full((nk, max_len + 1), END_TOK, jnp.int32)
    out_idx = out_idx.at[:, 0].set(START_TOK)

    def topk(decoded):
        if harness.char_topk is not None:
            return harness.char_topk(decoded, beams_k)
        return jax.lax.top_k(harness.char_logprobs(decoded), beams_k)

    decoded, caches = harness.decode_step(caches, out_idx[:, 0],
                                          jnp.int32(0), memory_mask_b)
    top_v, top_i = topk(decoded)
    beam_pos = jnp.arange(nk) % beams_k
    out_idx = out_idx.at[:, 1].set(top_i[jnp.arange(nk), beam_pos])
    log_probs = top_v[jnp.arange(nk), beam_pos]

    defer = _defer_colors()
    state = BeamState(
        step=jnp.int32(1), out_idx=out_idx, log_probs=log_probs,
        caches=caches, done=jnp.zeros((n,), bool),
        best_seq=jnp.full((n, max_len + 1), END_TOK, jnp.int32),
        best_logprob=jnp.full((n,), -jnp.inf, jnp.float32),
        best_colors=jnp.zeros(
            (1, 1, 1) if defer else (n, max_len, harness.embd_dim),
            memory.dtype),
        parent=jnp.arange(nk, dtype=jnp.int32),
        row_src=(jnp.broadcast_to(
            jnp.arange(nk, dtype=jnp.int32)[:, None],
            (nk, max_len)) if defer else jnp.zeros((1, 1), jnp.int32)),
        best_row_src=jnp.zeros((n, max_len) if defer else (1, 1),
                               jnp.int32))

    def latch(state: BeamState, newly_done: jax.Array) -> BeamState:
        lp = state.log_probs.reshape(n, beams_k)
        best_beam = jnp.argmax(lp, axis=1)
        flat = jnp.arange(n) * beams_k + best_beam
        seq = state.out_idx[flat]
        take = newly_done[:, None]
        upd = dict(
            done=state.done | newly_done,
            best_seq=jnp.where(take, seq, state.best_seq),
            best_logprob=jnp.where(newly_done, lp[jnp.arange(n), best_beam],
                                   state.best_logprob))
        if defer:
            upd['best_row_src'] = jnp.where(take, state.row_src[flat],
                                            state.best_row_src)
        else:
            colors = harness.cache_out(state.caches)[flat]
            upd['best_colors'] = jnp.where(take[:, :, None], colors,
                                           state.best_colors)
        return state._replace(**upd)

    def cond(state: BeamState):
        return (state.step < max_len) & ~jnp.all(state.done)

    def body(state: BeamState) -> BeamState:
        step = state.step
        last_tok = state.out_idx[jnp.arange(nk), step]
        if harness.fused_gather:
            decoded, caches = harness.decode_step(
                state.caches, last_tok, step, memory_mask_b, state.parent)
        else:
            decoded, caches = harness.decode_step(state.caches, last_tok,
                                                  step, memory_mask_b)
        top_v, top_i = topk(decoded)
        finished = last_tok == END_TOK
        top_v = jnp.where(finished[:, None], 0.0, top_v)
        top_i = jnp.where(finished[:, None], END_TOK, top_i)

        cand_logp = (state.log_probs[:, None]
                     + top_v).reshape(n, beams_k * beams_k)
        sel_v, sel_flat = jax.lax.top_k(cand_logp, beams_k)
        parent = sel_flat // beams_k
        new_tok_idx = sel_flat % beams_k
        parent_flat = (jnp.arange(n)[:, None] * beams_k + parent).reshape(-1)

        new_out = state.out_idx[parent_flat]
        tok = top_i.reshape(n, beams_k, beams_k)[
            jnp.arange(n)[:, None], parent, new_tok_idx].reshape(-1)
        new_out = jax.vmap(lambda row, t, s: row.at[s].set(t))(
            new_out, tok, jnp.full((nk,), step + 1))
        new_caches = harness.cache_gather(caches, parent_flat)
        if defer:
            # decode_step wrote out row ``step`` for the PRE-selection
            # slots: record identity there, then permute like out_idx
            rs = jax.lax.dynamic_update_slice(
                state.row_src, jnp.arange(nk, dtype=jnp.int32)[:, None],
                (0, step))
            new_row_src = rs[parent_flat]
        else:
            new_row_src = state.row_src
        new_state = state._replace(step=step + 1, out_idx=new_out,
                                   log_probs=sel_v.reshape(-1),
                                   caches=new_caches,
                                   row_src=new_row_src,
                                   parent=parent_flat.astype(jnp.int32))
        fin = (tok == END_TOK).reshape(n, beams_k)
        newly_done = (fin.sum(axis=1) >= max_finished_hypos) & ~state.done
        return latch(new_state, newly_done)

    state = jax.lax.while_loop(cond, body, state)
    state = latch(state, ~state.done)
    if defer:
        # ONE gather assembles the winning beams' color rows from the
        # unpermuted output cache via the recorded row sources
        outc = harness.cache_out(state.caches)
        cols = outc[state.best_row_src, jnp.arange(max_len)[None, :]]
        state = state._replace(best_colors=cols)
    return state


@jax.jit
def compute_memory(params: Dict, images: jax.Array,
                   valid_widths: jax.Array):
    """The encoder half of OCR inference: ConvNeXt backbone + transformer
    encoder. Returns ``(memory (N, M, E), memory_mask (N, M))``.

    Split out from ``beam_decode`` so the backbone can batch-amortize
    across decode chunks: the backbone's ~30 conv fusions run at 6-19% MXU
    utilization at 24-crop shapes (r4 xprof), so one 48-crop forward
    feeding two 24-crop decode loops is cheaper than two fused
    backbone+decode programs. Composing ``compute_memory`` +
    ``beam_decode_from_memory`` is exactly ``beam_decode``."""
    # bf16 activations (default on): the f32 backbone runs at 6-19% MXU
    # utilization and is activation-bandwidth-bound (r4 xprof; r5 A/B in
    # devscripts/profiling/ocr_backbone_bf16_ab.py). Matmul/conv
    # accumulation stays f32 via preferred_element_type; the decode side
    # consumes the memory in bf16 regardless (prepare_mem). Opt out with
    # MIT_TPU_OCR_BF16_BACKBONE=0 (e.g. for f32 oracle comparisons).
    in_dtype = images.dtype
    if os.environ.get('MIT_TPU_OCR_BF16_BACKBONE', '1') != '0':
        images = images.astype(jnp.bfloat16)
    memory = convnext_features(P(params).scope('backbone'), images)
    mem_len = memory.shape[1]
    valid_feats = (valid_widths + 3) // 4 + 2
    memory_mask = (jnp.arange(mem_len)[None, :]
                   >= jnp.minimum(valid_feats, mem_len)[:, None])
    memory = encoder_forward(params, memory, memory_mask)
    return memory.astype(in_dtype), memory_mask


@functools.partial(jax.jit,
                   static_argnames=('beams_k', 'max_len',
                                    'max_finished_hypos'))
def beam_decode(params: Dict, images: jax.Array, valid_widths: jax.Array,
                beams_k: int = 5, max_len: int = 255,
                max_finished_hypos: int = 2):
    """Full OCR inference for a batch of 48px strips.

    Args:
      images: (N, 48, W, 3) float in [-1, 1].
      valid_widths: (N,) int32 pixel widths before padding.
    Returns dict with sequences (N, max_len+1), probs (N,), and per-timestep
    color predictions of the winning beam.
    """
    memory, memory_mask = compute_memory(params, images, valid_widths)
    return beam_decode_from_memory(params, memory, memory_mask,
                                   beams_k=beams_k, max_len=max_len,
                                   max_finished_hypos=max_finished_hypos)


@functools.partial(jax.jit,
                   static_argnames=('beams_k', 'max_len',
                                    'max_finished_hypos'))
def beam_decode_from_memory(params: Dict, memory: jax.Array,
                            memory_mask: jax.Array, beams_k: int = 5,
                            max_len: int = 255,
                            max_finished_hypos: int = 2):
    """The decode half of OCR inference: beam search + color heads over a
    precomputed encoder memory (see ``compute_memory``)."""
    n = memory.shape[0]
    pallas_mode = _pallas_decode_mode()
    if pallas_mode is not None:
        harness = _pallas_harness(params, memory.dtype, max_len,
                                  interpret=(pallas_mode == 'interpret'))
    # Default is the per-layer activation-rotation path: the stacked
    # "fused" variant rotates the (5, E, 3E) WEIGHTS each step, which costs
    # ~10x the HBM traffic of rotating (N, E) activations at OCR batch
    # sizes — measured 159 vs 135 ms per 32-crop chunk on v5e. Kept as an
    # opt-in for large-batch experiments.
    elif os.environ.get('MIT_TPU_OCR_FUSED', '0') == '1':
        sp = stack_decoder_params(params)
        wtab = xpos_weight_tables(max_len)
        harness = BeamHarness(
            init_caches=lambda mem_b, nk, mask_b: init_stacked_caches(
                params, mem_b, nk, max_len),
            decode_step=lambda caches, tok, step, mask_b:
                decode_step_stacked(params, sp, caches, tok, step, mask_b,
                                    wtab),
            char_logprobs=lambda dec: char_logprobs(params, dec),
            char_topk=lambda dec, k: char_topk(params, dec, k),
            cache_gather=lambda caches, idx: StackedCaches(
                self_k=caches.self_k[:, idx], self_v=caches.self_v[:, idx],
                mem_k=caches.mem_k, mem_v=caches.mem_v,
                out=(caches.out if _defer_colors() else caches.out[idx])),
            cache_out=lambda caches: caches.out,
            embd_dim=EMBD_DIM)
    else:
        xpos_tables = xpos_step_tables(max_len)
        # transpose the (V, E) vocab matrix ONCE, outside the while_loop
        wout = params['embd.weight'].T
        harness = BeamHarness(
            init_caches=lambda mem_b, nk, mask_b: init_caches(
                params, mem_b, nk, max_len),
            decode_step=lambda caches, tok, step, mask_b: decode_step(
                params, caches, tok, step, mask_b, xpos_tables),
            char_logprobs=lambda dec: char_logprobs(params, dec, wout),
            char_topk=lambda dec, k: char_topk(params, dec, k, wout),
            cache_gather=lambda caches, idx: DecodeCaches(
                self_k=caches.self_k[:, idx], self_v=caches.self_v[:, idx],
                mem_k=caches.mem_k, mem_v=caches.mem_v,
                out=(caches.out if _defer_colors() else caches.out[idx])),
            cache_out=lambda caches: caches.out,
            embd_dim=EMBD_DIM)
    state = run_beam(harness, memory, memory_mask, n, beams_k, max_len,
                     max_finished_hypos)

    fg, bg, fg_ind, bg_ind = color_predictions(params, state.best_colors)
    return {
        'sequences': state.best_seq[:, 1:],          # drop start token
        'probs': jnp.exp(state.best_logprob),
        'fg': fg, 'bg': bg, 'fg_ind': fg_ind, 'bg_ind': bg_ind,
    }


def sharded_beam_decode(params: Dict, images: jax.Array,
                        valid_widths: jax.Array, beams_k: int = 5,
                        max_len: int = 255, max_finished_hypos: int = 2):
    """beam_decode, data-parallel over every visible chip.

    When the process sees a multi-device mesh (parallel/mesh.get_mesh),
    the crop batch is padded to a device multiple and the FULL decode
    program (backbone + encoder + beam while_loop, Pallas kernels
    included) runs per-shard under shard_map — each chip decodes its crop
    slice with zero collectives. Single-device: plain beam_decode.
    This is the production multi-chip OCR path (SURVEY §2.15
    "Intra-page micro-batching" TPU equivalent)."""
    from ..parallel.mesh import data_parallel, get_mesh, mesh_devices
    mesh = get_mesh()
    n = images.shape[0]
    if mesh is None:
        return beam_decode(params, images, valid_widths, beams_k=beams_k,
                           max_len=max_len,
                           max_finished_hypos=max_finished_hypos)
    nd = mesh_devices(mesh)
    pad = (-n) % nd
    if pad:
        # zero crops decode to </S> on step 1 — cheap padding rows
        images = jnp.concatenate(
            [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
        valid_widths = jnp.concatenate(
            [valid_widths, jnp.zeros((pad,), valid_widths.dtype)])

    def fn(p, im, w):
        return beam_decode(p, im, w, beams_k=beams_k, max_len=max_len,
                           max_finished_hypos=max_finished_hypos)

    ret = data_parallel(
        fn, mesh, 2,
        key=('ocr48.beam', beams_k, max_len, max_finished_hypos))(
            params, images, valid_widths)
    if pad:
        ret = {k: v[:n] for k, v in ret.items()}
    return ret


def sharded_compute_memory(params: Dict, images: jax.Array,
                           valid_widths: jax.Array):
    """compute_memory, data-parallel over every visible chip (zero-width
    padding rows encode to a fully-masked memory and are cropped back)."""
    from ..parallel.mesh import sharded_batch
    return sharded_batch(compute_memory, 'ocr48.memory', params, images,
                         valid_widths, jit_fallback=compute_memory)


def sharded_beam_decode_from_memory(params: Dict, memory: jax.Array,
                                    memory_mask: jax.Array,
                                    beams_k: int = 5, max_len: int = 255,
                                    max_finished_hypos: int = 2):
    """beam_decode_from_memory, data-parallel over every visible chip.

    Padding rows get zero memory with an all-valid mask (uniform attention
    over zeros — cheap, NaN-free) and are cropped from the result."""
    from ..parallel.mesh import sharded_batch

    def fn(p, mem, mask):
        return beam_decode_from_memory(
            p, mem, mask, beams_k=beams_k, max_len=max_len,
            max_finished_hypos=max_finished_hypos)

    def fallback(p, mem, mask):
        return beam_decode_from_memory(
            p, mem, mask, beams_k=beams_k, max_len=max_len,
            max_finished_hypos=max_finished_hypos)

    return sharded_batch(
        fn, ('ocr48.decode_mem', beams_k, max_len, max_finished_hypos),
        params, memory, memory_mask, jit_fallback=fallback)


# --------------------------------------------------------------------------
# Random init (offline fallback / benchmarks)
# --------------------------------------------------------------------------

def init_params(dict_size: int, dtype=jnp.float32) -> Dict:
    rs = np.random.RandomState(42)
    params: Dict = {}

    def dense(key, i, o, std=None):
        std = std or (1.0 / np.sqrt(i))
        params[key + '.weight'] = jnp.asarray(
            rs.randn(i, o).astype(np.float32) * std, dtype)
        params[key + '.bias'] = jnp.zeros((o,), dtype)

    def conv(key, kh, kw, ci, co, groups=1, bias=True):
        params[key + '.weight'] = jnp.asarray(
            rs.randn(kh, kw, ci // groups, co).astype(np.float32)
            * np.sqrt(2.0 / (kh * kw * ci // groups)), dtype)
        if bias:
            params[key + '.bias'] = jnp.zeros((co,), dtype)

    def bn(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)
        params[key + '.running_mean'] = jnp.zeros((c,), jnp.float32)
        params[key + '.running_var'] = jnp.ones((c,), jnp.float32)

    def ln(key, c):
        params[key + '.weight'] = jnp.ones((c,), dtype)
        params[key + '.bias'] = jnp.zeros((c,), dtype)

    base = EMBD_DIM // 8  # 40
    bb = 'backbone'
    conv(f'{bb}.stem.0', 7, 7, 3, base)
    bn(f'{bb}.stem.1', base)
    conv(f'{bb}.stem.3', 2, 2, base, base * 2)
    bn(f'{bb}.stem.4', base * 2)
    conv(f'{bb}.stem.6', 3, 3, base * 2, base * 2)
    bn(f'{bb}.stem.7', base * 2)

    def blocks(name, dim, nblk, ks):
        for i in range(nblk):
            pre = f'{bb}.{name}.{i}'
            conv(f'{pre}.dwconv', ks, ks, dim, dim, groups=dim)
            bn(f'{pre}.norm', dim)
            conv(f'{pre}.pwconv1', 1, 1, dim, dim * 4)
            conv(f'{pre}.pwconv2', 1, 1, dim * 4, dim)
            params[f'{pre}.gamma'] = jnp.full((1, dim, 1, 1), 1e-6, dtype)

    blocks('block1', base * 2, 4, 7)
    conv(f'{bb}.down1.0', 2, 2, base * 2, base * 4)
    bn(f'{bb}.down1.1', base * 4)
    blocks('block2', base * 4, 12, 7)
    conv(f'{bb}.down2.0', 2, 1, base * 4, base * 8)
    bn(f'{bb}.down2.1', base * 8)
    blocks('block3', base * 8, 10, 5)
    conv(f'{bb}.down3.0', 2, 1, base * 8, base * 8)
    bn(f'{bb}.down3.1', base * 8)
    blocks('block4', base * 8, 8, 3)
    conv(f'{bb}.down4.0', 3, 1, base * 8, base * 8)
    bn(f'{bb}.down4.1', base * 8)

    for i in range(N_ENCODERS):
        pre = f'encoders.{i}'
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            dense(f'{pre}.self_attn.{proj}', EMBD_DIM, EMBD_DIM)
        dense(f'{pre}.linear1', EMBD_DIM, FF_DIM)
        dense(f'{pre}.linear2', FF_DIM, EMBD_DIM)
        ln(f'{pre}.norm1', EMBD_DIM)
        ln(f'{pre}.norm2', EMBD_DIM)

    for i in range(N_DECODERS):
        pre = f'decoders.{i}'
        for att in ('self_attn', 'multihead_attn'):
            for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
                dense(f'{pre}.{att}.{proj}', EMBD_DIM, EMBD_DIM)
        dense(f'{pre}.linear1', EMBD_DIM, FF_DIM)
        dense(f'{pre}.linear2', FF_DIM, EMBD_DIM)
        for nrm in ('norm1', 'norm2', 'norm3'):
            ln(f'{pre}.{nrm}', EMBD_DIM)

    params['embd.weight'] = jnp.asarray(
        rs.randn(dict_size, EMBD_DIM).astype(np.float32) * 0.02, dtype)
    dense('pred1.0', EMBD_DIM, EMBD_DIM)
    params['pred.bias'] = jnp.zeros((dict_size,), dtype)
    dense('color_pred1.0', EMBD_DIM, 64)
    dense('color_pred_fg', 64, 3)
    dense('color_pred_bg', 64, 3)
    dense('color_pred_fg_ind', 64, 2)
    dense('color_pred_bg_ind', 64, 2)
    return params


TRANSPOSED_CONV_PATTERNS: Tuple[str, ...] = ()
EMBEDDING_PATTERNS = (r'^embd\.weight$', r'^pred\.weight$')
