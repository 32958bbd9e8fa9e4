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


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('mpe', [False, True])
def test_s2d_shell_matches_direct(fold, mpe, monkeypatch):
    """The space-to-depth phase-packed shell (stem + 3 downsamples on the
    cell grid) is an exact reindexing of the direct convs — outputs must
    match to float rounding, with and without folded BN and MPE
    embeddings."""
    params = lama.init_params(n_blocks=2, dtype=jnp.float32)
    if fold:
        params = lama.fold_bn(params, n_blocks=2)
    rs = np.random.RandomState(3)
    img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, 64, 64, 1) < 0.2).astype(np.float32))
    kw = {}
    if mpe:
        kw['rel_pos_emb'] = jnp.asarray(
            rs.rand(1, 64, 64, lama.NGF).astype(np.float32) * 0.1)
        kw['direct_emb'] = jnp.asarray(
            rs.rand(1, 64, 64, lama.NGF).astype(np.float32) * 0.1)

    monkeypatch.setenv('MIT_TPU_LAMA_S2D', '0')
    ref = lama.lama_generator_forward(params, img * (1 - mask), mask,
                                      n_blocks=2, **kw)
    monkeypatch.setenv('MIT_TPU_LAMA_S2D', '1')
    got = lama.lama_generator_forward(params, img * (1 - mask), mask,
                                      n_blocks=2, **kw)
    err = float(jnp.abs(ref - got).max())
    assert err < 2e-5, (fold, mpe, err)


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
