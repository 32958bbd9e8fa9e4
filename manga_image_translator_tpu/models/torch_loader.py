"""PyTorch checkpoint → JAX parameter conversion.

Models in this framework consume a flat ``{torch_key: jax.Array}`` dict; this
module converts a torch state dict into that form:

* conv weights   OIHW  → HWIO
* conv-transpose IOHW  → spatially-flipped HW, then (H, W, I→in, O→out)
  (so :func:`..models.functional.conv_transpose2d` can run it as an
  input-dilated regular convolution)
* linear weights (O,I) → (I,O)
* everything else (biases, norms, embeddings) passes through

Because tensor rank alone cannot distinguish conv from conv-transpose, each
model declares its transposed-conv key patterns.

Reference checkpoints (URLs + sha256 from the reference `_MODEL_MAPPING`
blocks, e.g. detection/default.py:28-34) are downloaded/verified by
utils.inference.ModelWrapper and loaded here with ``torch.load`` on CPU.
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

import jax.numpy as jnp


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_state_dict(sd: Dict[str, 'object'],
                       transposed_conv_patterns: Sequence[str] = (),
                       dtype=jnp.float32,
                       keep_fp32_patterns: Sequence[str] = (),
                       embedding_patterns: Sequence[str] = (),
                       ) -> Dict[str, jnp.ndarray]:
    """Convert a torch state dict to the flat JAX params layout.

    Args:
      transposed_conv_patterns: regexes matched against full key names; 4-D
        weights matching one are treated as ConvTranspose2d weights.
      dtype: target dtype for floating weights (bf16 for TPU inference).
      keep_fp32_patterns: regexes for weights kept in fp32 (e.g. norm stats).
      embedding_patterns: regexes for 2-D weights that are embeddings (kept
        (vocab, dim), not transposed like linear layers).
    """
    t_res = [re.compile(p) for p in transposed_conv_patterns]
    f_res = [re.compile(p) for p in keep_fp32_patterns]
    e_res = [re.compile(p) for p in embedding_patterns]
    out: Dict[str, jnp.ndarray] = {}
    for key, val in sd.items():
        arr = _to_numpy(val)
        leaf = key.split('.')[-1]
        if arr.ndim == 4 and leaf == 'weight':
            if any(r.search(key) for r in t_res):
                # torch ConvTranspose2d: (in, out, kh, kw)
                arr = arr[:, :, ::-1, ::-1]           # flip spatial
                arr = arr.transpose(2, 3, 0, 1)        # (kh, kw, in, out)
            else:
                arr = arr.transpose(2, 3, 1, 0)        # OIHW → HWIO
        elif (arr.ndim == 2 and leaf in ('weight', 'in_proj_weight')
                and not _is_norm(key)
                and not any(r.search(key) for r in e_res)):
            # in_proj_weight: torch packed-MHA (3E, E) transposes like any
            # linear weight — caught by the ocr48_ctc/ocr32 full-model
            # oracles (a real checkpoint load would have delivered it
            # untransposed while init_params makes (E, 3E))
            arr = arr.T                                # (O,I) → (I,O)
        target = dtype
        if (_is_norm_stat(key) or any(r.search(key) for r in f_res)
                or not np.issubdtype(arr.dtype, np.floating)):
            target = None
        a = jnp.asarray(np.ascontiguousarray(arr))
        if target is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(target)
        out[key] = a
    return out


_NORM_HINTS = ('running_mean', 'running_var', 'num_batches_tracked')


def _is_norm_stat(key: str) -> bool:
    return any(h in key for h in _NORM_HINTS)


def _is_norm(key: str) -> bool:
    return any(h in key for h in _NORM_HINTS)


def strip_prefix(sd: Dict[str, object], prefix: str) -> Dict[str, object]:
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


def drop_keys(sd: Dict[str, object],
              patterns: Iterable[str]) -> Dict[str, object]:
    res = [re.compile(p) for p in patterns]
    return {k: v for k, v in sd.items() if not any(r.search(k) for r in res)}


def load_torch_checkpoint(path: str, key: Optional[str] = None):
    """torch.load a .ckpt/.pt on CPU, returning the raw state dict."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if key is not None and key in sd:
        sd = sd[key]
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    elif isinstance(sd, dict) and 'model' in sd and isinstance(sd['model'], dict):
        sd = sd['model']
    return sd
