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
