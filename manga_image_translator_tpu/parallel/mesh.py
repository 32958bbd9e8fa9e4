"""Multi-chip scaling: device mesh, shardings, and the sharded page step.

The reference has no distributed compute at all (SURVEY.md §2.15 — its only
parallelism is HTTP fan-out to executor processes). The TPU-native scaling
story is:

* **data parallel over pages** — each page's detect/OCR/inpaint graph is
  independent, so the batch axis shards over the ``dp`` mesh axis and XLA
  needs no collectives in the forward path;
* **tensor parallel within models** — the OCR transformer's feed-forward
  (320→2048→320, the widest matmuls) shards its hidden dimension over the
  ``tp`` axis; GSPMD inserts the reduce-scatter/all-gather pair on ICI;
* **fine-tuning** — ``train_step_dbnet`` is a full pjit-able training step
  (forward, loss, grads, SGD update) whose gradient all-reduce rides the
  mesh automatically.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, tp: int = None) -> Mesh:
    """Mesh with ('dp', 'tp') axes covering exactly ``n_devices`` devices.

    tp defaults to 2 when divisible. Raises if fewer than ``n_devices``
    devices exist or the axes don't tile them — a silently-truncated mesh
    would "pass" multi-chip checks while exercising a single device.
    """
    devices = np.array(jax.devices())
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f'requested a {n_devices}-device mesh but jax sees only '
            f'{len(devices)} ({devices[0].platform}); for a virtual mesh '
            f'set XLA_FLAGS=--xla_force_host_platform_device_count='
            f'{n_devices} and call '
            f"jax.config.update('jax_platforms', 'cpu') before the backend "
            f'initializes (the env var alone may be overridden by '
            f'sitecustomize)')
    devices = devices[:n_devices]
    if tp is None:
        tp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    if n_devices % tp != 0:
        raise ValueError(f'{n_devices} devices not divisible by tp={tp}')
    dp = n_devices // tp
    return Mesh(devices.reshape(dp, tp), ('dp', 'tp'))


def shard_ocr_params_tp(params: Dict, mesh: Mesh) -> Dict:
    """Place OCR transformer params: FF weights sharded over tp, everything
    else replicated."""
    out = {}
    for key, value in params.items():
        if key.endswith('linear1.weight'):       # (in, hidden): shard hidden
            spec = P(None, 'tp')
        elif key.endswith('linear1.bias'):
            spec = P('tp')
        elif key.endswith('linear2.weight'):     # (hidden, out): shard hidden
            spec = P('tp', None)
        else:
            spec = P()
        out[key] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def replicate(params: Dict, mesh: Mesh) -> Dict:
    sharding = NamedSharding(mesh, P())
    return {k: jax.device_put(v, sharding) for k, v in params.items()}


def pipeline_step(mesh: Mesh, db_params: Dict, ocr_params: Dict,
                  inpaint_params: Dict):
    """Builds the jitted multi-chip page step:

    pages (B, H, W, 3) sharded over dp → detection prob/mask maps, OCR
    encoder memory (tp-sharded FF), and AOT-inpainted pages — one XLA
    program, batch parallel over chips.
    """
    from ..models.aot import aot_generator_forward
    from ..models.dbnet import dbnet_forward
    from ..models.ocr48 import encoder_forward

    page_sharding = NamedSharding(mesh, P('dp'))
    rep = NamedSharding(mesh, P())

    def step(dbp, ocrp, inpp, pages, crops, crop_mask, masks):
        x = pages.astype(jnp.float32) / 127.5 - 1.0
        db, seg = dbnet_forward(dbp, x)
        prob = jax.nn.sigmoid(db[..., 0])

        from ..models.functional import P as Pscope
        from ..models.ocr48 import convnext_features
        memory = convnext_features(Pscope(ocrp).scope('backbone'),
                                   crops.astype(jnp.float32) / 127.5 - 1.0)
        memory = encoder_forward(ocrp, memory, crop_mask)

        img = pages.astype(jnp.float32) / 127.5 - 1.0
        inpainted = aot_generator_forward(inpp, img * (1 - masks), masks)
        return prob, memory, inpainted

    return jax.jit(
        step,
        in_shardings=(rep, None, rep, page_sharding, page_sharding,
                      page_sharding, page_sharding),
        out_shardings=(page_sharding, page_sharding, page_sharding))


def train_step_dbnet(mesh: Mesh):
    """Full data-parallel training step for the detector (loss + grads +
    SGD update). Grad all-reduce is inserted by GSPMD over the dp axis."""
    from ..models.dbnet import dbnet_forward

    page_sharding = NamedSharding(mesh, P('dp'))
    rep = NamedSharding(mesh, P())

    def loss_fn(params, batch, target_prob, target_mask):
        x = batch.astype(jnp.float32) / 127.5 - 1.0
        db, seg = dbnet_forward(params, x)
        prob = jax.nn.sigmoid(db[..., 0])
        l_db = jnp.mean(jnp.abs(prob - target_prob))
        l_seg = jnp.mean(jnp.abs(seg[..., 0] - target_mask))
        return l_db + l_seg

    def step(params, batch, target_prob, target_mask, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch,
                                                  target_prob, target_mask)
        new_params = jax.tree.map(
            lambda p, g: (p - lr * g).astype(p.dtype) if g is not None else p,
            params, grads)
        return loss, new_params

    return jax.jit(step,
                   in_shardings=(rep, page_sharding, page_sharding,
                                 page_sharding, None),
                   out_shardings=(None, rep))
