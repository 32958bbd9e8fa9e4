"""Parity of the channel-major Pallas FourierUnit kernels vs the XLA
split-einsum path (models/lama._fourier_unit), interpret mode on CPU.

The fp32 kernel (fourier_unit_cm) must match near-exactly; the bf16x3
split-matmul kernel (fourier_unit_cm3) within bf16x3 rounding (~2^-17
relative, amplified by the DFT contraction length).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from manga_image_translator_tpu.models import lama
from manga_image_translator_tpu.models.lama import P


def _fu_params(c, rs):
    return {
        'conv_layer.weight': jnp.asarray(
            rs.randn(1, 1, 2 * c, 2 * c).astype(np.float32) * 0.1),
        'conv_layer.bias': jnp.asarray(
            rs.randn(2 * c).astype(np.float32) * 0.01),
        'bn.running_mean': jnp.asarray(
            rs.randn(2 * c).astype(np.float32) * 0.05),
        'bn.running_var': jnp.asarray(
            rs.rand(2 * c).astype(np.float32) + 0.5),
        'bn.weight': jnp.asarray(
            rs.rand(2 * c).astype(np.float32) + 0.5),
        'bn.bias': jnp.asarray(rs.randn(2 * c).astype(np.float32) * 0.05),
    }


@pytest.mark.parametrize('kernel', ['pallas', 'pallas3'])
def test_fourier_unit_kernels_match_xla(kernel, monkeypatch):
    c, h, w = 16, 16, 16
    rs = np.random.RandomState(0)
    params = _fu_params(c, rs)
    x = jnp.asarray(rs.rand(1, h, w, c).astype(np.float32))

    ref = lama._fourier_unit(P(params), x)
    monkeypatch.setenv('MIT_TPU_LAMA_FU', kernel)
    got = lama._fourier_unit_pallas(P(params), x, interpret=True)

    scale = float(jnp.abs(ref).max())
    err = float(jnp.abs(got - ref).max()) / max(scale, 1e-6)
    tol = 1e-4 if kernel == 'pallas3' else 1e-5
    assert err < tol, (kernel, err)
