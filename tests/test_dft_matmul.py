"""The matmul-DFT must match jnp.fft exactly (it replaces XLA's slow TPU FFT
inside the LaMa FourierUnit)."""
import numpy as np

import jax.numpy as jnp

from manga_image_translator_tpu.models.lama import (
    _irfft2_matmul,
    _rfft2_matmul,
)


def test_rfft2_matches_fft():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 16, 24, 3).astype(np.float32)
    re, im = _rfft2_matmul(jnp.asarray(x))
    ref = np.fft.rfft2(x, axes=(1, 2), norm='ortho')
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-4)


def test_irfft2_roundtrip():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 12, 20, 4).astype(np.float32)
    re, im = _rfft2_matmul(jnp.asarray(x))
    back = _irfft2_matmul(re, im, 12, 20)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_irfft2_matches_fft_on_modified_spectrum():
    rs = np.random.RandomState(2)
    h, w = 16, 16
    re = rs.randn(1, h, w // 2 + 1, 2).astype(np.float32)
    im = rs.randn(1, h, w // 2 + 1, 2).astype(np.float32)
    ours = _irfft2_matmul(jnp.asarray(re), jnp.asarray(im), h, w)
    comp = (re + 1j * im).transpose(0, 3, 1, 2)
    ref = np.fft.irfft2(comp, s=(h, w), axes=(2, 3), norm='ortho')
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(0, 2, 3, 1), atol=1e-4)


def test_odd_width():
    rs = np.random.RandomState(3)
    x = rs.randn(1, 8, 15, 1).astype(np.float32)
    re, im = _rfft2_matmul(jnp.asarray(x))
    back = _irfft2_matmul(re, im, 8, 15)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


# --- split (K-padded) path: the default inside _fourier_unit -------------

def test_rfft2_split_pad_lanes_exactly_zero():
    """Forward zero cos/sin columns must produce EXACT zeros in the padded
    K lanes (the invariant that lets garbage survive bias/BN/ReLU)."""
    from manga_image_translator_tpu.models.lama import _rfft2_split
    rs = np.random.RandomState(3)
    h, w = 12, 26                  # K = 14 -> padded to 16
    x = rs.randn(2, h, w, 3).astype(np.float32)
    re, im = _rfft2_split(jnp.asarray(x))
    k = w // 2 + 1
    assert re.shape[2] == 16 and im.shape[2] == 16
    assert np.all(np.asarray(re)[:, :, k:] == 0.0)
    assert np.all(np.asarray(im)[:, :, k:] == 0.0)


def test_rfft2_split_prefix_matches_fft():
    from manga_image_translator_tpu.models.lama import _rfft2_split
    rs = np.random.RandomState(4)
    h, w = 12, 26
    x = rs.randn(2, h, w, 3).astype(np.float32)
    re, im = _rfft2_split(jnp.asarray(x))
    k = w // 2 + 1
    ref = np.fft.rfft2(x, axes=(1, 2), norm='ortho')
    np.testing.assert_allclose(np.asarray(re)[:, :, :k], ref.real, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im)[:, :, :k], ref.imag, atol=1e-4)


def test_irfft2_split_cancels_pad_lane_garbage():
    """Inverse zero rows must multiply padded-lane garbage by 0: roundtrip
    is exact even when NONZERO garbage is written into the padded lanes
    (modelling the FU's bias/BN/ReLU output there)."""
    from manga_image_translator_tpu.models.lama import (_irfft2_split,
                                                        _rfft2_split)
    rs = np.random.RandomState(5)
    h, w = 12, 26
    x = rs.randn(1, h, w, 4).astype(np.float32)
    re, im = _rfft2_split(jnp.asarray(x))
    k = w // 2 + 1
    re = re.at[:, :, k:].set(jnp.asarray(rs.randn(1, h, 16 - k, 4) * 50))
    im = im.at[:, :, k:].set(jnp.asarray(rs.randn(1, h, 16 - k, 4) * 50))
    back = _irfft2_split(re, im, h, w)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_dft_mats_split_cache_keys_on_env_flag(monkeypatch):
    """MIT_TPU_LAMA_PADK toggling after import must take effect (advisor
    r3: the flag participates in the lru_cache key)."""
    from manga_image_translator_tpu.models import lama
    h, w = 8, 26
    k = w // 2 + 1
    monkeypatch.setenv('MIT_TPU_LAMA_PADK', '1')
    padded = lama._dft_mats_split(h, w)
    assert padded[0].shape[1] == 16
    monkeypatch.setenv('MIT_TPU_LAMA_PADK', '0')
    unpadded = lama._dft_mats_split(h, w)
    assert unpadded[0].shape[1] == k
