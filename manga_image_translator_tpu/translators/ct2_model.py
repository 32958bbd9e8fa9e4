"""CTranslate2 model reader + JAX transformer seq2seq.

The reference's sugoi/jparacrawl translators run released CTranslate2
model directories through the native ctranslate2 library
(translators/sugoi.py:60-113). That library is not available in this
image, so this module provides a TPU-native replacement:

* ``read_ct2_model``: parses the ``model.bin`` binary (the model_spec
  serialization: u32 binary version, null-terminated length-prefixed
  strings, per-variable name/rank/dims/dtype/payload, alias table).
  Versions 2-6 are handled; int8/int16-quantized variables are
  dequantized with their ``*_scale`` companions. Every parse step is
  validated (sizes must add up) and failures raise — never silent.
* ``Ct2Transformer``: the fairseq-style transformer (as converted by
  ct2-fairseq-converter: post-layer-norm, sinusoidal positions, fused QKV
  self-attention, fused-KV cross-attention) implemented as pure-JAX
  functions with KV-cached greedy/beam decoding under ``lax.while_loop``.

Vocabularies load from the model dir's ``*vocabulary.txt`` / ``.json``.
"""
from __future__ import annotations

import json
import os
import re
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_DTYPES = {
    'float32': (np.float32, 4), 'float': (np.float32, 4),
    'float16': (np.float16, 2), 'bfloat16': (np.uint16, 2),
    'int8': (np.int8, 1), 'int16': (np.int16, 2), 'int32': (np.int32, 4),
}


class Ct2FormatError(RuntimeError):
    pass


def _read_string(buf: memoryview, pos: int) -> Tuple[str, int]:
    (ln,) = struct.unpack_from('<H', buf, pos)
    pos += 2
    raw = bytes(buf[pos:pos + ln])
    pos += ln
    if not raw.endswith(b'\0'):
        raise Ct2FormatError(f'string at {pos - ln} not null-terminated')
    return raw[:-1].decode('utf-8'), pos


def read_ct2_model(path: str) -> Dict[str, np.ndarray]:
    """Parse model.bin -> {variable name: np.ndarray} (dequantized f32)."""
    with open(path, 'rb') as f:
        data = memoryview(f.read())
    pos = 0
    (version,) = struct.unpack_from('<I', data, pos)
    pos += 4
    if not 1 <= version <= 6:
        raise Ct2FormatError(f'unsupported binary version {version}')
    spec_name = ''
    revision = 0
    if version >= 2:
        spec_name, pos = _read_string(data, pos)
        (revision,) = struct.unpack_from('<I', data, pos)
        pos += 4
    (num_vars,) = struct.unpack_from('<I', data, pos)
    pos += 4
    if num_vars > 10000:
        raise Ct2FormatError(f'implausible variable count {num_vars}')

    variables: Dict[str, np.ndarray] = {}
    for _ in range(num_vars):
        name, pos = _read_string(data, pos)
        (rank,) = struct.unpack_from('<B', data, pos)
        pos += 1
        dims = struct.unpack_from(f'<{rank}I', data, pos)
        pos += 4 * rank
        if version >= 4:
            dtype_name, pos = _read_string(data, pos)
            if dtype_name not in _DTYPES:
                raise Ct2FormatError(f'{name}: unknown dtype {dtype_name}')
            np_dtype, item = _DTYPES[dtype_name]
            (nbytes,) = struct.unpack_from('<I', data, pos)
            pos += 4
        else:
            (item,) = struct.unpack_from('<B', data, pos)
            pos += 1
            (nbytes,) = struct.unpack_from('<I', data, pos)
            pos += 4
            np_dtype = {4: np.float32, 2: np.float16,
                        1: np.int8}.get(item)
            if np_dtype is None:
                raise Ct2FormatError(f'{name}: unknown item size {item}')
        expected = int(np.prod(dims)) * item if rank else nbytes
        if nbytes != expected:
            raise Ct2FormatError(
                f'{name}: payload {nbytes} != prod{tuple(dims)}*{item}')
        arr = np.frombuffer(data, np_dtype, count=nbytes // item,
                            offset=pos).reshape(dims)
        pos += nbytes
        variables[name] = arr

    # alias table (v2+)
    if version >= 2 and pos + 4 <= len(data):
        (num_aliases,) = struct.unpack_from('<I', data, pos)
        pos += 4
        if num_aliases <= 10000:
            try:
                for _ in range(num_aliases):
                    alias, pos = _read_string(data, pos)
                    target, pos = _read_string(data, pos)
                    if target in variables:
                        variables[alias] = variables[target]
            except (struct.error, Ct2FormatError):
                pass

    # dequantize int8/int16 weights with their *_scale companions
    out: Dict[str, np.ndarray] = {}
    for name, arr in variables.items():
        if name.endswith('_scale'):
            continue
        if arr.dtype in (np.int8, np.int16):
            scale = variables.get(name + '_scale')
            if scale is None:
                raise Ct2FormatError(f'{name}: quantized but no scale')
            arr = arr.astype(np.float32) / np.asarray(
                scale, np.float32).reshape(-1, *([1] * (arr.ndim - 1)))
        elif arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        out[name] = np.ascontiguousarray(arr)
    return out


def load_vocabulary(model_dir: str) -> Tuple[List[str], Optional[List[str]]]:
    """-> (source_vocab, target_vocab or None when shared)."""
    def read_txt(p):
        with open(p, encoding='utf-8') as f:
            return [line.rstrip('\n') for line in f]

    j = os.path.join(model_dir, 'shared_vocabulary.json')
    if os.path.isfile(j):
        return json.load(open(j, encoding='utf-8')), None
    t = os.path.join(model_dir, 'shared_vocabulary.txt')
    if os.path.isfile(t):
        return read_txt(t), None
    sj = os.path.join(model_dir, 'source_vocabulary.json')
    if os.path.isfile(sj):
        return (json.load(open(sj, encoding='utf-8')),
                json.load(open(os.path.join(model_dir,
                                            'target_vocabulary.json'),
                               encoding='utf-8')))
    st = os.path.join(model_dir, 'source_vocabulary.txt')
    if os.path.isfile(st):
        return (read_txt(st),
                read_txt(os.path.join(model_dir, 'target_vocabulary.txt')))
    raise Ct2FormatError(f'no vocabulary files in {model_dir}')


def read_config(model_dir: str) -> dict:
    p = os.path.join(model_dir, 'config.json')
    if os.path.isfile(p):
        with open(p, encoding='utf-8') as f:
            return json.load(f)
    return {}


# --------------------------------------------------------------------------
# JAX transformer over the ct2 TransformerSpec variable space
# --------------------------------------------------------------------------

class Ct2Transformer:
    """Encoder-decoder transformer running the ct2 variable dict in JAX.

    Naming (ct2 TransformerSpec): ``encoder/layer_<i>/self_attention/
    {linear_0,linear_1}`` (fused QKV in linear_0), ``.../ffn/{linear_0,
    linear_1}``, per-sublayer ``layer_norm/{gamma,beta}``; decoder adds
    ``attention/{linear_0,linear_1,linear_2}`` (Q, fused KV, out) and
    ``projection``. Embeddings: ``encoder/embeddings/weight`` (or
    ``embeddings_0``), ``decoder/embeddings/weight``.
    """

    def __init__(self, variables: Dict[str, np.ndarray], config: dict,
                 src_vocab: List[str], tgt_vocab: Optional[List[str]]):
        import jax.numpy as jnp
        self.v = variables
        self.cfg = config
        self.src_vocab = src_vocab
        self.tgt_vocab = tgt_vocab if tgt_vocab is not None else src_vocab
        self.src_index = {p: i for i, p in enumerate(src_vocab)}
        self.tgt_index = {p: i for i, p in enumerate(self.tgt_vocab)}
        self.unk_id = self.src_index.get('<unk>', 0)
        self.bos_id = self.tgt_index.get('<s>', 1)
        self.eos_id = self.tgt_index.get('</s>', 2)
        # ct2 config may override the decoder start token (m2m100 starts
        # from '</s>', fairseq-converted models from '<s>')
        start_tok = config.get('decoder_start_token')
        self.start_id = (self.tgt_index.get(start_tok, self.bos_id)
                         if start_tok else self.bos_id)

        names = list(variables)
        self.n_enc = 1 + max((int(m.group(1)) for n in names
                              for m in [re.match(r'encoder/layer_(\d+)/',
                                                 n)] if m), default=-1)
        self.n_dec = 1 + max((int(m.group(1)) for n in names
                              for m in [re.match(r'decoder/layer_(\d+)/',
                                                 n)] if m), default=-1)
        if self.n_enc == 0 or self.n_dec == 0:
            raise Ct2FormatError(
                f'no encoder/decoder layers among {names[:8]}...')
        emb = self._emb('encoder')
        self.d_model = emb.shape[1]
        self.num_heads = int(config.get('num_heads')
                             or {512: 8, 1024: 16}.get(self.d_model, 8))
        self.pre_norm = bool(config.get('pre_norm', False)) or \
            'encoder/layer_norm/gamma' in variables
        self.params = {k: jnp.asarray(v) for k, v in variables.items()}

    def _emb(self, side: str) -> np.ndarray:
        for key in (f'{side}/embeddings/weight',
                    f'{side}/embeddings_0/weight', 'embeddings/weight'):
            if key in self.v:
                return self.v[key]
        raise Ct2FormatError(f'no {side} embeddings found')

    def _emb_key(self, side: str) -> str:
        for key in (f'{side}/embeddings/weight',
                    f'{side}/embeddings_0/weight', 'embeddings/weight'):
            if key in self.v:
                return key
        raise Ct2FormatError(side)

    # ---- functional pieces -------------------------------------------------
    def _ln(self, prefix, x):
        import jax.numpy as jnp
        g = self.params[f'{prefix}/gamma']
        b = self.params[f'{prefix}/beta']
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return ((xf - mean) / jnp.sqrt(var + 1e-5) * g + b).astype(x.dtype)

    def _linear(self, prefix, x):
        import jax.numpy as jnp
        w = self.params[f'{prefix}/weight']          # ct2 stores (out, in)
        y = jnp.einsum('...i,oi->...o', x, w,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        b = self.params.get(f'{prefix}/bias')
        return y + b if b is not None else y

    def _sinusoid(self, length: int) -> np.ndarray:
        d = self.d_model
        pos = np.arange(length, dtype=np.float32)[:, None]
        half = d // 2
        inv = np.power(10000.0, -np.arange(half, dtype=np.float32) / half)
        ang = pos * inv[None]
        # ct2/fairseq layout: [sin | cos] concatenated
        return np.concatenate([np.sin(ang), np.cos(ang)],
                              axis=1).astype(np.float32)

    def _attention(self, q, k, v, mask, heads):
        import jax
        import jax.numpy as jnp
        b, lq, d = q.shape
        lk = k.shape[1]
        hd = d // heads
        q = q.reshape(b, lq, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        if mask is not None:
            s = jnp.where(mask, -jnp.inf, s)
        w = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', w.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        return o.transpose(0, 2, 1, 3).reshape(b, lq, d)

    def encode(self, tokens, lengths):
        """tokens (B, L) int32 -> encoder states (B, L, D)."""
        import jax
        import jax.numpy as jnp
        emb = self.params[self._emb_key('encoder')]
        x = emb[tokens] * jnp.sqrt(jnp.float32(self.d_model)).astype(
            emb.dtype)
        x = x + jnp.asarray(self._sinusoid(tokens.shape[1]))
        pad = (jnp.arange(tokens.shape[1])[None, :]
               >= lengths[:, None])            # (B, L) True = pad
        mask = pad[:, None, None, :]
        for i in range(self.n_enc):
            pre = f'encoder/layer_{i}'
            res = x
            xi = self._ln(f'{pre}/self_attention/layer_norm', x) \
                if self.pre_norm else x
            qkv = self._linear(f'{pre}/self_attention/linear_0', xi)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = self._attention(q, k, v, mask, self.num_heads)
            a = self._linear(f'{pre}/self_attention/linear_1', a)
            x = res + a
            if not self.pre_norm:
                x = self._ln(f'{pre}/self_attention/layer_norm', x)
            res = x
            xi = self._ln(f'{pre}/ffn/layer_norm', x) if self.pre_norm \
                else x
            h = jax.nn.relu(self._linear(f'{pre}/ffn/linear_0', xi))
            h = self._linear(f'{pre}/ffn/linear_1', h)
            x = res + h
            if not self.pre_norm:
                x = self._ln(f'{pre}/ffn/layer_norm', x)
        if self.pre_norm and 'encoder/layer_norm/gamma' in self.params:
            x = self._ln('encoder/layer_norm', x)
        return x, pad

    def translate_batch(self, batch_tokens: List[List[str]],
                        beam_size: int = 5, max_len: int = 200,
                        repetition_penalty: float = 3.0,
                        target_prefix: Optional[List[List[str]]] = None
                        ) -> List[List[str]]:
        """Beam (or greedy) translate tokenized pieces -> target pieces.

        Mirrors the reference call contract (sugoi.py:104-113:
        translate_batch(beam_size=5, repetition_penalty=3, disable_unk);
        m2m100.py:82-91 adds target_prefix=[[lang]] forcing).
        """
        import jax.numpy as jnp
        if not batch_tokens:
            return []
        ids = [[self.src_index.get(t, self.unk_id) for t in toks]
               + [self.eos_id] for toks in batch_tokens]
        maxlen = max(len(t) for t in ids)
        arr = np.full((len(ids), maxlen), self.eos_id, np.int32)
        lengths = np.zeros((len(ids),), np.int32)
        for i, t in enumerate(ids):
            arr[i, :len(t)] = t
            lengths[i] = len(t)
        # forced decoder prefix (per-row, padded): position 0 is the
        # decoder start token, positions 1..P are forced
        if target_prefix is not None:
            if len(target_prefix) != len(ids):
                raise ValueError('target_prefix length != batch size')
            plen = max((len(p) for p in target_prefix), default=0)
            prefix = np.zeros((len(ids), max(plen, 1)), np.int32)
            prefix_len = np.zeros((len(ids),), np.int32)
            for i, p in enumerate(target_prefix):
                for j, tok in enumerate(p):
                    prefix[i, j] = self.tgt_index.get(tok, self.unk_id)
                prefix_len[i] = len(p)
        else:
            prefix = np.zeros((len(ids), 1), np.int32)
            prefix_len = np.zeros((len(ids),), np.int32)
        out_ids = _beam_decode(self, jnp.asarray(arr), jnp.asarray(lengths),
                               max_len, repetition_penalty,
                               jnp.asarray(prefix), jnp.asarray(prefix_len),
                               beam_size)
        results = []
        for row in np.asarray(out_ids):
            toks = []
            for tid in row:
                if tid == self.eos_id:
                    break
                if tid == self.unk_id:
                    continue                       # disable_unk semantics
                toks.append(self.tgt_vocab[int(tid)])
            results.append(toks)
        return results


def _beam_decode(model: Ct2Transformer, tokens, lengths, max_len: int,
                 rep_penalty: float, prefix, prefix_len, beam_size: int):
    """KV-cached fixed-shape beam decode under one while_loop program.

    TPU-shaped beam search: K beams per sentence flattened into a (B*K)
    decoder batch; finished beams emit only EOS at logprob 0; forced
    target prefixes (m2m100's ``target_prefix=[[lang]]``, reference
    m2m100.py:85) override the first ``prefix_len`` emissions of every
    beam. The repetition penalty (ct2 semantics: divide positive /
    multiply negative scores of previously GENERATED tokens) sees only
    positions 1..t — never the EOS/BOS prefill of the fixed-shape token
    buffer. Final hypothesis maximizes score/length (ct2
    length_penalty=1)."""
    import jax
    import jax.numpy as jnp

    memory, pad = model.encode(tokens, lengths)
    b = tokens.shape[0]
    K = max(int(beam_size), 1)
    bk = b * K
    d = model.d_model
    heads = model.num_heads
    emb = model.params[model._emb_key('decoder')]
    proj_w = model.params['decoder/projection/weight']
    proj_b = model.params.get('decoder/projection/bias')
    vocab = proj_w.shape[0]
    L = max_len + 1
    sin_table = jnp.asarray(model._sinusoid(L))
    plen_max = prefix.shape[1]

    # per-beam copies of the encoder memory state
    cross_kv = []
    for i in range(model.n_dec):
        pre = f'decoder/layer_{i}/attention'
        kv = model._linear(f'{pre}/linear_1', memory)
        ck, cv = jnp.split(kv, 2, axis=-1)
        cross_kv.append((jnp.repeat(ck, K, axis=0),
                         jnp.repeat(cv, K, axis=0)))
    mask_mem = jnp.repeat(pad, K, axis=0)[:, None, None, :]

    def fwd(last, caches, t):
        """One decoder step on the flattened (B*K) batch."""
        x = emb[last][:, None, :] * jnp.sqrt(
            jnp.float32(d)).astype(emb.dtype)
        x = x + sin_table[t][None, None, :]
        new_caches = []
        for i in range(model.n_dec):
            pre = f'decoder/layer_{i}'
            res = x
            xi = model._ln(f'{pre}/self_attention/layer_norm', x) \
                if model.pre_norm else x
            qkv = model._linear(f'{pre}/self_attention/linear_0', xi)
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            ck, cv = caches[i]
            ck = jax.lax.dynamic_update_slice(ck, k_new, (0, t, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_new, (0, t, 0))
            new_caches.append((ck, cv))
            smask = (jnp.arange(L)[None, None, None, :] > t)
            a = model._attention(q, ck, cv, smask, heads)
            a = model._linear(f'{pre}/self_attention/linear_1', a)
            x = res + a
            if not model.pre_norm:
                x = model._ln(f'{pre}/self_attention/layer_norm', x)
            res = x
            xi = model._ln(f'{pre}/attention/layer_norm', x) \
                if model.pre_norm else x
            q2 = model._linear(f'{pre}/attention/linear_0', xi)
            ck2, cv2 = cross_kv[i]
            a2 = model._attention(q2, ck2, cv2, mask_mem, heads)
            a2 = model._linear(f'{pre}/attention/linear_2', a2)
            x = res + a2
            if not model.pre_norm:
                x = model._ln(f'{pre}/attention/layer_norm', x)
            res = x
            xi = model._ln(f'{pre}/ffn/layer_norm', x) if model.pre_norm \
                else x
            h = jax.nn.relu(model._linear(f'{pre}/ffn/linear_0', xi))
            h = model._linear(f'{pre}/ffn/linear_1', h)
            x = res + h
            if not model.pre_norm:
                x = model._ln(f'{pre}/ffn/layer_norm', x)
        if model.pre_norm and 'decoder/layer_norm/gamma' in model.params:
            x = model._ln('decoder/layer_norm', x)
        logits = jnp.einsum('bld,vd->blv', x, proj_w,
                            preferred_element_type=jnp.float32)[:, 0]
        if proj_b is not None:
            logits = logits + proj_b
        return logits, new_caches

    NEG = jnp.float32(-1e9)

    def step(carry):
        toks, scores, caches, t, done, out_len = carry
        last = jax.lax.dynamic_slice(
            toks, (0, 0, t), (b, K, 1)).reshape(bk)
        logits, new_caches = fwd(last, caches, t)

        # repetition penalty over emitted positions 1..t only
        pos_valid = (jnp.arange(L) >= 1) & (jnp.arange(L) <= t)
        rows = jnp.broadcast_to(jnp.arange(bk)[:, None], (bk, L))
        seen = jnp.zeros((bk, vocab), jnp.bool_).at[
            rows, toks.reshape(bk, L)].max(
                jnp.broadcast_to(pos_valid[None, :], (bk, L)))
        penalized = jnp.where(logits > 0, logits / rep_penalty,
                              logits * rep_penalty)
        logits = jnp.where(seen, penalized, logits)
        logits = logits.at[:, model.unk_id].set(NEG)

        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, K, vocab)
        # finished beams only extend with EOS at zero cost
        eos_only = jnp.full((vocab,), NEG).at[model.eos_id].set(0.0)
        logp = jnp.where(done[:, :, None], eos_only[None, None, :], logp)
        # forced prefix emission
        forced_tok = prefix[:, jnp.minimum(t, plen_max - 1)]
        forced = t < prefix_len
        forced_row = jnp.where(
            jax.nn.one_hot(forced_tok, vocab, dtype=bool), 0.0, NEG)
        logp = jnp.where(forced[:, None, None], forced_row[:, None, :],
                         logp)

        total = scores[:, :, None] + logp
        top_scores, top_idx = jax.lax.top_k(total.reshape(b, K * vocab), K)
        beam_idx = top_idx // vocab
        tok_idx = (top_idx % vocab).astype(jnp.int32)

        toks = jnp.take_along_axis(toks, beam_idx[:, :, None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        out_len = jnp.take_along_axis(out_len, beam_idx, axis=1)
        scores = top_scores
        toks = jax.lax.dynamic_update_slice(
            toks, tok_idx[:, :, None], (0, 0, t + 1))
        out_len = out_len + (~done).astype(jnp.int32)
        done = done | (tok_idx == model.eos_id)

        gather = (jnp.arange(b)[:, None] * K + beam_idx).reshape(bk)
        new_caches = [(ck[gather], cv[gather]) for ck, cv in new_caches]
        return toks, scores, new_caches, t + 1, done, out_len

    def cond(carry):
        _, _, _, t, done, _ = carry
        return (t < max_len) & ~jnp.all(done)

    toks0 = jnp.full((b, K, L), model.eos_id, jnp.int32)
    toks0 = toks0.at[:, :, 0].set(model.start_id)
    scores0 = jnp.full((b, K), NEG).at[:, 0].set(0.0)
    caches0 = [(jnp.zeros((bk, L, d), memory.dtype),
                jnp.zeros((bk, L, d), memory.dtype))
               for _ in range(model.n_dec)]
    done0 = jnp.zeros((b, K), bool)
    out_len0 = jnp.zeros((b, K), jnp.int32)

    toks, scores, _, _, _, out_len = jax.lax.while_loop(
        cond, step, (toks0, scores0, caches0, jnp.int32(0), done0,
                     out_len0))
    norm = scores / jnp.maximum(out_len, 1).astype(jnp.float32)
    best = jnp.argmax(norm, axis=1)
    return toks[jnp.arange(b), best, 1:]


import jax  # noqa: E402  (kept at bottom: numpy-only parsing works without)
