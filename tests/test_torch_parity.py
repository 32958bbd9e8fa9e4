"""Golden-parity tests: functional JAX primitives + the torch-checkpoint
converter vs raw torch.nn modules with random weights.

This is the parity gate that validates the weight-conversion pipeline without
needing the released checkpoints (no network in CI).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from manga_image_translator_tpu.models import functional as F
from manga_image_translator_tpu.models.torch_loader import convert_state_dict


def t2j_in(x_nchw: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_nchw.permute(0, 2, 3, 1).numpy())


def j2t_out(y_nhwc) -> np.ndarray:
    return np.asarray(y_nhwc).transpose(0, 3, 1, 2)


@pytest.mark.parametrize('stride,padding,k', [(1, 1, 3), (2, 1, 3),
                                              (2, 3, 7), (1, 0, 1)])
def test_conv2d(stride, padding, k):
    torch.manual_seed(0)
    m = torch.nn.Conv2d(8, 16, k, stride=stride, padding=padding)
    x = torch.randn(2, 8, 17, 23)
    with torch.no_grad():
        ref = m(x).numpy()
    params = convert_state_dict(m.state_dict())
    out = F.conv2d(t2j_in(x), params['weight'], params['bias'],
                   stride=stride, padding=padding)
    np.testing.assert_allclose(j2t_out(out), ref, atol=2e-5)


@pytest.mark.parametrize('stride,padding,k,h,w,dil', [
    (1, 1, 3, 17, 23, 1), (2, 1, 3, 16, 24, 1), (2, 1, 3, 17, 23, 1),
    (1, 3, 7, 17, 23, 1), (2, 3, 7, 16, 24, 1), (1, 1, 3, 8, 8, 1),
    (1, 2, 3, 17, 23, 2), (1, 4, 3, 17, 23, 4), (1, 8, 3, 24, 24, 8),
    (2, 1, 4, 16, 24, 1),
])
def test_conv2d_reflect_banded(stride, padding, k, h, w, dil, monkeypatch):
    """The banded fast path (zero-pad conv + border-band recompute) must
    match both torch Conv2d(padding_mode='reflect') and the materialized
    jnp.pad reflect path exactly."""
    torch.manual_seed(3)
    m = torch.nn.Conv2d(8, 16, k, stride=stride, padding=padding,
                        dilation=dil, padding_mode='reflect')
    x = torch.randn(2, 8, h, w)
    with torch.no_grad():
        ref = m(x).numpy()
    params = convert_state_dict(m.state_dict())

    monkeypatch.setenv('MIT_TPU_REFLECT_FAST', '1')
    fast = F.conv2d(t2j_in(x), params['weight'], params['bias'],
                    stride=stride, padding=padding, dilation=dil,
                    pad_mode='reflect')
    np.testing.assert_allclose(j2t_out(fast), ref, atol=2e-5)

    monkeypatch.setenv('MIT_TPU_REFLECT_FAST', '0')
    slow = F.conv2d(t2j_in(x), params['weight'], params['bias'],
                    stride=stride, padding=padding, dilation=dil,
                    pad_mode='reflect')
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=2e-6)


@pytest.mark.parametrize('k,s,p', [(4, 2, 1), (3, 2, 1), (2, 2, 0)])
def test_conv_transpose2d(k, s, p):
    torch.manual_seed(1)
    m = torch.nn.ConvTranspose2d(6, 12, k, stride=s, padding=p)
    x = torch.randn(2, 6, 9, 13)
    with torch.no_grad():
        ref = m(x).numpy()
    params = convert_state_dict(m.state_dict(),
                                transposed_conv_patterns=[r'weight'])
    out = F.conv_transpose2d(t2j_in(x), params['weight'], params['bias'],
                             stride=s, padding=p, kernel_size=k)
    assert j2t_out(out).shape == ref.shape
    np.testing.assert_allclose(j2t_out(out), ref, atol=2e-5)


@pytest.mark.parametrize('k,s,p,op', [(4, 2, 1, 0), (2, 2, 0, 0),
                                      (6, 4, 1, 0), (3, 3, 0, 0),
                                      (3, 2, 1, 1), (5, 4, 1, 1)])
def test_conv_transpose2d_phase_packed(k, s, p, op):
    """Phase-packed transposed conv (one stride-1 conv + depth-to-space)
    vs torch, for every k - 2p + op == s config used in the repo and then
    some. Covers odd input sizes (the packed path has no even-size
    requirement: output tiles by construction when k - 2p + op == s)."""
    assert k - 2 * p + op == s
    torch.manual_seed(3)
    m = torch.nn.ConvTranspose2d(6, 5, k, stride=s, padding=p,
                                 output_padding=op)
    x = torch.randn(2, 6, 9, 13)
    with torch.no_grad():
        ref = m(x).numpy()
    params = convert_state_dict(m.state_dict(),
                                transposed_conv_patterns=[r'weight'])
    out = F.conv_transpose2d_packed(t2j_in(x), params['weight'],
                                    params['bias'], stride=s, padding=p,
                                    kernel_size=k, output_padding=op)
    assert j2t_out(out).shape == ref.shape
    np.testing.assert_allclose(j2t_out(out), ref, atol=2e-5)


def test_batch_norm():
    torch.manual_seed(2)
    m = torch.nn.BatchNorm2d(10).eval()
    with torch.no_grad():
        m.running_mean.normal_()
        m.running_var.uniform_(0.5, 2.0)
        m.weight.normal_()
        m.bias.normal_()
    x = torch.randn(2, 10, 5, 7)
    with torch.no_grad():
        ref = m(x).numpy()
    p = convert_state_dict(m.state_dict())
    out = F.batch_norm(t2j_in(x), p['weight'], p['bias'],
                       p['running_mean'], p['running_var'])
    np.testing.assert_allclose(j2t_out(out), ref, atol=1e-5)


def test_linear():
    torch.manual_seed(3)
    m = torch.nn.Linear(24, 48)
    x = torch.randn(5, 24)
    with torch.no_grad():
        ref = m(x).numpy()
    p = convert_state_dict(m.state_dict())
    out = F.linear(jnp.asarray(x.numpy()), p['weight'], p['bias'])
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_layer_norm():
    torch.manual_seed(4)
    m = torch.nn.LayerNorm(32)
    with torch.no_grad():
        m.weight.normal_()
        m.bias.normal_()
    x = torch.randn(4, 7, 32)
    with torch.no_grad():
        ref = m(x).numpy()
    p = convert_state_dict(m.state_dict())
    out = F.layer_norm(jnp.asarray(x.numpy()), p['weight'], p['bias'])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_max_avg_pool():
    x = torch.randn(2, 4, 11, 13)
    ref = torch.nn.functional.max_pool2d(x, 3, 2, 1).numpy()
    out = F.max_pool2d(t2j_in(x), 3, 2, 1)
    np.testing.assert_allclose(j2t_out(out), ref, atol=1e-6)
    ref = torch.nn.functional.avg_pool2d(x, 2, 2).numpy()
    out = F.avg_pool2d(t2j_in(x), 2, 2)
    np.testing.assert_allclose(j2t_out(out), ref, atol=1e-6)


def test_resnet_basic_block_composition():
    """Conv+BN+ReLU residual block vs torch composition."""
    torch.manual_seed(5)

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(16, 32, 3, 2, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(32)
            self.conv2 = torch.nn.Conv2d(32, 32, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(32)
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(16, 32, 1, 2, bias=False),
                torch.nn.BatchNorm2d(32))

        def forward(self, x):
            idt = self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    m = Block().eval()
    with torch.no_grad():
        for bn in (m.bn1, m.bn2, m.downsample[1]):
            bn.running_mean.normal_(0, 0.1)
            bn.running_var.uniform_(0.5, 2.0)
    x = torch.randn(1, 16, 16, 16)
    with torch.no_grad():
        ref = m(x).numpy()

    from manga_image_translator_tpu.models.dbnet import _basic_block
    params = convert_state_dict(m.state_dict())
    out = _basic_block(F.P(params), t2j_in(x), stride=2)
    np.testing.assert_allclose(j2t_out(out), ref, atol=1e-4)


def test_dbnet_shapes_and_jit():
    import jax
    from manga_image_translator_tpu.models.dbnet import dbnet_forward, init_params
    params = init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    fwd = jax.jit(dbnet_forward)
    db, mask = fwd(params, x)
    # DB head upsamples 4x from the 1/4-scale feature map -> full res;
    # mask head sits at 1/2 res (reference DBNet_resnet34.py:108-125)
    assert db.shape == (1, 256, 256, 2)
    assert mask.shape == (1, 128, 128, 1)
    # threshold channel is sigmoided
    assert float(jnp.min(db[..., 1])) >= 0.0
    assert float(jnp.max(db[..., 1])) <= 1.0
    assert float(jnp.min(mask)) >= 0.0


def test_conv2d_phase_packed():
    """Generic low-N stride-1 conv phase packing vs torch."""
    torch.manual_seed(7)
    m = torch.nn.Conv2d(6, 3, 3, padding=1)
    x = torch.randn(2, 6, 32, 24)
    with torch.no_grad():
        ref = m(x).numpy()
    params = convert_state_dict(m.state_dict())
    for s in (2, 4, 8):
        out = F.conv2d_phase_packed(t2j_in(x), params['weight'],
                                    params['bias'], padding=1, s=s)
        assert j2t_out(out).shape == ref.shape
        np.testing.assert_allclose(j2t_out(out), ref, atol=2e-5)


def test_nearest2x_conv_packed():
    """conv3x3(nearest2x(x)) fold vs torch interpolate + conv."""
    torch.manual_seed(8)
    m = torch.nn.Conv2d(6, 5, 3, padding=1)
    x = torch.randn(2, 6, 9, 13)
    with torch.no_grad():
        ref = m(torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode='nearest')).numpy()
    params = convert_state_dict(m.state_dict())
    out = F.nearest2x_conv_packed(t2j_in(x), params['weight'],
                                  params['bias'])
    assert j2t_out(out).shape == ref.shape
    np.testing.assert_allclose(j2t_out(out), ref, atol=2e-5)


def test_esrgan_deconv_pack_matches_default(monkeypatch):
    """MIT_TPU_DECONV_PACK=1 routes the ESRGAN tail (2 nearest2x-conv
    folds + phase-packed final conv) — full forward must match."""
    import jax
    from manga_image_translator_tpu.models.esrgan import (esrgan_forward,
                                                          init_params)
    params = init_params(nb=2)
    rs = np.random.RandomState(21)
    x = jnp.asarray(rs.rand(1, 32, 24, 3).astype(np.float32))
    monkeypatch.setenv('MIT_TPU_DECONV_PACK', '0')
    ref = jax.jit(lambda p, x: esrgan_forward(p, x, nb=2))(params, x)
    monkeypatch.setenv('MIT_TPU_DECONV_PACK', '1')
    got = jax.jit(lambda p, x: esrgan_forward(p, x, nb=2))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_esrgan_deconv_pack_nondivisible_fallback(monkeypatch):
    """Tail sizes not divisible by the packing stride fall back to the
    plain conv — outputs must still match the default graph."""
    import jax
    from manga_image_translator_tpu.models.esrgan import (esrgan_forward,
                                                          init_params)
    params = init_params(nb=1)
    rs = np.random.RandomState(22)
    x = jnp.asarray(rs.rand(1, 29, 23, 3).astype(np.float32))  # 4x: 116x92
    monkeypatch.setenv('MIT_TPU_DECONV_PACK', '0')
    ref = jax.jit(lambda p, x: esrgan_forward(p, x, nb=1))(params, x)
    monkeypatch.setenv('MIT_TPU_DECONV_PACK', '1')
    got = jax.jit(lambda p, x: esrgan_forward(p, x, nb=1))(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dbnet_deconv_pack_matches_default(monkeypatch):
    """MIT_TPU_DECONV_PACK=1 routes every DBNet transposed conv (7 up
    blocks + both head stacks) through the phase-packed form; the full
    forward must match the input-dilated default."""
    import jax
    from manga_image_translator_tpu.models.dbnet import dbnet_forward, init_params
    params = init_params(jax.random.PRNGKey(1))
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1)
    monkeypatch.setenv('MIT_TPU_DECONV_PACK', '0')
    db0, m0 = jax.jit(dbnet_forward)(params, x)
    monkeypatch.setenv('MIT_TPU_DECONV_PACK', '1')
    db1, m1 = jax.jit(dbnet_forward)(params, x)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=2e-4, atol=2e-4)


def test_dbnet_head_pack_matches_default(monkeypatch):
    """MIT_TPU_DBHEAD_PACK=1 phase-packs only the DB head's two
    transposed-conv stacks (16->16, 16->1) — the full detector forward
    must match the native lowering (same contractions, f32
    re-association only); the mask head is untouched."""
    import jax
    from manga_image_translator_tpu.models.dbnet import (dbnet_forward,
                                                         init_params)
    params = init_params(jax.random.PRNGKey(0))
    rs = np.random.RandomState(23)
    # smallest size whose 7-level down pyramid stays non-degenerate
    x = jnp.asarray(rs.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1)
    monkeypatch.setenv('MIT_TPU_DBHEAD_PACK', '0')
    db0, m0 = jax.jit(lambda p, x: dbnet_forward(p, x))(params, x)
    monkeypatch.setenv('MIT_TPU_DBHEAD_PACK', '1')
    db1, m1 = jax.jit(lambda p, x: dbnet_forward(p, x))(params, x)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
