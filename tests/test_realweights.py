"""Real-checkpoint parity tier (``pytest -m realweights``).

Every other oracle test seeds random weights; this tier downloads one REAL
released checkpoint per major family, converts it with the production
loader, and golden-diffs our JAX forward against the reference torch model
executing the SAME checkpoint (VERDICT r4 #8 — makes pixel-parity testable
instead of aspirational).

Network-gated: cleanly skipped when the release hosts are unreachable
(this CI image has zero egress). With network:

    pytest tests/test_realweights.py -m realweights -v

Checkpoints land in the normal model dir and are cached across runs.
"""
import asyncio
import os
import socket

import numpy as np
import pytest

import ref_oracle

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.realweights


def _online(host='github.com', port=443, timeout=3.0) -> bool:
    try:
        socket.create_connection((host, port), timeout=timeout).close()
        return True
    except OSError:
        return False


_ONLINE = _online()
needs_network = pytest.mark.skipif(
    not _ONLINE, reason='release hosts unreachable (offline CI) — '
                        'realweights parity runs only with network')


def _download(wrapper) -> None:
    asyncio.run(wrapper.download())


def nhwc_in(t):
    return np.asarray(t.numpy().transpose(0, 2, 3, 1))


def nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@needs_network
def test_dbnet_real_checkpoint_parity():
    from manga_image_translator_tpu.detection.default import DefaultDetector
    from manga_image_translator_tpu.models import dbnet
    from manga_image_translator_tpu.models.torch_loader import (
        convert_state_dict, load_torch_checkpoint)
    import jax

    det = DefaultDetector()
    _download(det)
    sd = load_torch_checkpoint(str(det._mapping_file_path('model')))

    mod = ref_oracle.load('detection.default_utils.DBNet_resnet34')
    net = mod.TextDetection(pretrained=None).eval()
    net.load_state_dict({k.removeprefix('module.'): torch.as_tensor(v)
                         for k, v in sd.items()}, strict=False)
    x = torch.from_numpy(
        np.random.RandomState(0).rand(1, 3, 256, 256).astype(np.float32)
        * 2 - 1)
    with torch.no_grad():
        ref_db, ref_mask = net(x)

    params = convert_state_dict(
        sd, transposed_conv_patterns=dbnet.TRANSPOSED_CONV_PATTERNS)
    db, mask = jax.jit(dbnet.dbnet_forward)(params, nhwc_in(x))
    np.testing.assert_allclose(nchw(db), ref_db.numpy(), rtol=1e-3,
                               atol=2e-3)
    np.testing.assert_allclose(nchw(mask), ref_mask.numpy(), rtol=1e-3,
                               atol=2e-3)


@needs_network
def test_lama_large_real_checkpoint_parity():
    from manga_image_translator_tpu.inpainting.inpainting_lama import (
        LamaLargeInpainter, _pick_gen)
    from manga_image_translator_tpu.models import lama
    from manga_image_translator_tpu.models.torch_loader import (
        convert_state_dict, load_torch_checkpoint)
    import jax

    inp = LamaLargeInpainter()
    _download(inp)
    raw = load_torch_checkpoint(str(inp._mapping_file_path('model')))
    gen_sd = _pick_gen(raw)

    mod = ref_oracle.load('inpainting.inpainting_lama_mpe')
    model = mod.LamaFourier(build_discriminator=False, use_mpe=False,
                            large_arch=True)
    gen = model.generator.eval()
    gen.load_state_dict({k: torch.as_tensor(v) for k, v in gen_sd.items()},
                        strict=True)

    rng = np.random.default_rng(1)
    img = torch.from_numpy(rng.random((1, 3, 64, 64), np.float32))
    mask = torch.zeros(1, 1, 64, 64)
    mask[:, :, 16:40, 20:52] = 1.0
    with torch.no_grad():
        ref = gen(img, mask)

    params = convert_state_dict(
        gen_sd,
        transposed_conv_patterns=lama.TRANSPOSED_CONV_PATTERNS_FOR_BLOCKS[
            18])
    img_j = nhwc_in(img) * (1.0 - nhwc_in(mask))
    out = jax.jit(lambda p, i, m: lama.lama_generator_forward(
        p, i, m, n_blocks=18))(params, img_j, nhwc_in(mask))
    np.testing.assert_allclose(nchw(out), ref.numpy(), rtol=1e-3, atol=3e-3)


@needs_network
def test_ocr48_real_checkpoint_parity():
    """Backbone+encoder memory computed from the real ocr_ar_48px.ckpt must
    match the reference model along its own inference path (same drive as
    test_model_oracle.test_ocr48_full_model, real weights)."""
    from manga_image_translator_tpu.models import ocr48
    from manga_image_translator_tpu.models.torch_loader import (
        convert_state_dict, load_torch_checkpoint)
    from manga_image_translator_tpu.ocr.model_48px import Model48pxOCR
    import jax.numpy as jnp

    ocr = Model48pxOCR()
    _download(ocr)
    sd = load_torch_checkpoint(str(ocr._mapping_file_path('model')))
    with open(ocr._mapping_file_path('dict'), encoding='utf8') as f:
        dictionary = [s.rstrip('\n') for s in f.readlines()]

    mod = ref_oracle.load('ocr.model_48px')
    net = mod.OCR(dictionary, 768).eval()
    net.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()},
                        strict=True)

    x = torch.from_numpy(
        np.random.RandomState(2).rand(2, 3, 48, 256).astype(np.float32)
        * 2 - 1)
    widths = [256, 200]
    with torch.no_grad():
        memory = net.backbone(x).squeeze(2).permute(0, 2, 1)  # N W C
        input_mask = torch.zeros(2, memory.size(1), dtype=torch.bool)
        for i, l in enumerate([(w + 3) // 4 + 2 for w in widths]):
            input_mask[i, l:] = True
        for layer in net.encoders:
            memory = layer(layer, src=memory,
                           src_key_padding_mask=input_mask)

    params = convert_state_dict(
        sd, embedding_patterns=ocr48.EMBEDDING_PATTERNS)
    # golden-diff against the f32 torch forward: disable the bf16
    # production backbone (its drift is covered by
    # test_bf16_backbone_sequences_match_f32, not by this tolerance)
    os.environ['MIT_TPU_OCR_BF16_BACKBONE'] = '0'
    try:
        mem, msk = ocr48.compute_memory.__wrapped__(
            params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(widths))
    finally:
        os.environ.pop('MIT_TPU_OCR_BF16_BACKBONE', None)
    np.testing.assert_array_equal(np.asarray(msk), input_mask.numpy())
    np.testing.assert_allclose(np.asarray(mem), memory.numpy(), rtol=2e-3,
                               atol=5e-3)


@needs_network
def test_aot_real_checkpoint_parity():
    from manga_image_translator_tpu.inpainting.inpainting_aot import (
        AotInpainter)
    from manga_image_translator_tpu.models import aot
    from manga_image_translator_tpu.models.torch_loader import (
        convert_state_dict, load_torch_checkpoint)
    import jax

    inp = AotInpainter()
    _download(inp)
    sd = load_torch_checkpoint(str(inp._mapping_file_path('model')))

    mod = ref_oracle.load('inpainting.inpainting_aot')
    net = mod.AOTGenerator().eval()
    net.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()},
                        strict=True)

    rng = np.random.default_rng(3)
    img = torch.from_numpy(rng.random((1, 3, 64, 64), np.float32) * 2 - 1)
    mask = torch.zeros(1, 1, 64, 64)
    mask[:, :, 20:44, 16:48] = 1.0
    img_masked = img * (1.0 - mask)
    with torch.no_grad():
        ref = net(img_masked, mask)

    params = convert_state_dict(
        sd, transposed_conv_patterns=aot.TRANSPOSED_CONV_PATTERNS)
    out = jax.jit(aot.aot_forward)(params, nhwc_in(img_masked),
                                   nhwc_in(mask))
    np.testing.assert_allclose(nchw(out), ref.numpy(), rtol=1e-3, atol=3e-3)
