"""Inpainting tests: FourierUnit parity vs torch-style numpy FFT math, model
shapes/jit, and end-to-end dispatch with random weights."""
import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_image_translator_tpu.models import aot, lama
from manga_image_translator_tpu.models.functional import P


class TestFourierUnit:
    def test_matches_numpy_reference(self):
        """Oracle re-derivation of reference FourierUnit.forward
        (inpainting_lama_mpe.py:213-253) in numpy."""
        rs = np.random.RandomState(0)
        n, h, w, c = 1, 8, 8, 4
        x = rs.randn(n, h, w, c).astype(np.float32)
        wconv = rs.randn(1, 1, 2 * c, 2 * c).astype(np.float32) * 0.2
        params = {
            'conv_layer.weight': jnp.asarray(wconv),
            'bn.weight': jnp.ones((2 * c,)),
            'bn.bias': jnp.zeros((2 * c,)),
            'bn.running_mean': jnp.zeros((2 * c,)),
            'bn.running_var': jnp.ones((2 * c,)),
        }
        got = np.asarray(lama._fourier_unit(P(params), jnp.asarray(x)))

        # numpy oracle in NCHW like torch
        xt = x.transpose(0, 3, 1, 2)
        f = np.fft.rfftn(xt, axes=(-2, -1), norm='ortho')
        stacked = np.stack([f.real, f.imag], axis=-1)  # (n,c,h,wf,2)
        ff = stacked.transpose(0, 1, 4, 2, 3).reshape(n, 2 * c, h, w // 2 + 1)
        wt = wconv[0, 0].T  # (out, in) for 1x1
        conv = np.einsum('oi,nihw->nohw', wt, ff)
        conv = np.maximum(conv, 0)  # BN is identity here
        back = conv.reshape(n, c, 2, h, w // 2 + 1).transpose(0, 1, 3, 4, 2)
        comp = back[..., 0] + 1j * back[..., 1]
        out = np.fft.irfftn(comp, s=(h, w), axes=(-2, -1), norm='ortho')
        ref = out.transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, ref, atol=1e-4)


class TestLamaModel:
    def test_forward_shape_and_jit(self):
        params = lama.init_params(n_blocks=9)
        img = jnp.zeros((1, 64, 64, 3))
        mask = jnp.zeros((1, 64, 64, 1))
        fwd = jax.jit(lambda p, i, m: lama.lama_generator_forward(
            p, i, m, n_blocks=9))
        out = fwd(params, img, mask)
        assert out.shape == (1, 64, 64, 3)
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    def test_mpe_encoding(self):
        mask = np.zeros((64, 64), np.float32)
        mask[20:40, 20:40] = 1
        rel_pos, direct = lama.masked_position_encoding(mask)
        assert rel_pos.shape == (64, 64)
        assert direct.shape == (64, 64, 4)
        # interior of the hole has larger distance ids than the rim
        assert rel_pos[30, 30] > rel_pos[21, 21] >= 0
        assert rel_pos[0, 0] == 0  # outside the mask


class TestAotModel:
    def test_forward_shape_and_range(self):
        params = aot.init_params()
        img = jnp.zeros((1, 64, 64, 3))
        mask = jnp.ones((1, 64, 64, 1))
        out = jax.jit(aot.aot_generator_forward)(params, img, mask)
        assert out.shape == (1, 64, 64, 3)
        assert float(jnp.max(jnp.abs(out))) <= 1.0

    def test_ws_weight_standardization(self):
        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(3, 3, 8, 16).astype(np.float32))
        gain = jnp.ones((16, 1, 1, 1))
        ws = np.asarray(aot._ws_weight(w, gain, False)).astype(np.float64)
        # standardized weights: zero mean, fan_in-scaled unit variance per
        # output channel
        means = ws.mean(axis=(0, 1, 2))
        np.testing.assert_allclose(means, 0, atol=1e-5)
        fan_in = 3 * 3 * 8
        var = np.asarray(w, np.float64).var(axis=(0, 1, 2), ddof=1)
        np.testing.assert_allclose(ws.var(axis=(0, 1, 2), ddof=0) * fan_in,
                                   var * fan_in / (var * fan_in), rtol=0.1)


class TestInpaintDispatch:
    @pytest.mark.parametrize('key', ['none', 'original'])
    def test_simple_inpainters(self, key):
        from manga_image_translator_tpu.inpainting import Inpainter, dispatch
        img = np.random.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[10:20, 10:20] = 255
        out = asyncio.run(dispatch(Inpainter(key), img, mask, None,
                                   inpainting_size=64, device='cpu'))
        assert out.shape == img.shape
        if key == 'none':
            assert (out[12, 12] == [255, 255, 255]).all()
        else:
            np.testing.assert_array_equal(out, img)

    def test_aot_end_to_end_random_weights(self):
        from manga_image_translator_tpu.inpainting import Inpainter, dispatch
        img = np.random.randint(0, 255, (72, 56, 3), dtype=np.uint8)
        mask = np.zeros((72, 56), np.uint8)
        mask[20:40, 10:30] = 255
        out = asyncio.run(dispatch(Inpainter.default, img, mask, None,
                                   inpainting_size=128, device='cpu'))
        assert out.shape == img.shape
        # unmasked pixels identical to input
        np.testing.assert_array_equal(out[0, 0], img[0, 0])

    def test_lama_end_to_end_random_weights(self):
        from manga_image_translator_tpu.config import InpainterConfig, InpaintPrecision
        from manga_image_translator_tpu.inpainting import Inpainter, dispatch
        img = np.random.randint(0, 255, (64, 48, 3), dtype=np.uint8)
        mask = np.zeros((64, 48), np.uint8)
        mask[20:40, 10:30] = 255
        cfg = InpainterConfig(inpainting_precision=InpaintPrecision.fp32)
        out = asyncio.run(dispatch(Inpainter.lama_large, img, mask, cfg,
                                   inpainting_size=64, device='cpu'))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out[0, 0], img[0, 0])


class TestFourierUnitSplit:
    def test_split_fu_matches_joint_form(self):
        """The re/im-split FourierUnit (zero layout ops) must match the
        reference's interleaved-conv formulation."""
        import jax.numpy as jnp
        from manga_image_translator_tpu.models import lama
        from manga_image_translator_tpu.models.functional import P, relu

        rs = np.random.RandomState(5)
        n, h, w, c = 1, 16, 24, 8
        params = {
            'fu.conv_layer.weight': jnp.asarray(
                rs.randn(1, 1, 2 * c, 2 * c).astype(np.float32) * 0.2),
            'fu.conv_layer.bias': jnp.asarray(
                rs.randn(2 * c).astype(np.float32) * 0.1),
            'fu.bn.weight': jnp.asarray(
                rs.rand(2 * c).astype(np.float32) + 0.5),
            'fu.bn.bias': jnp.asarray(
                rs.randn(2 * c).astype(np.float32) * 0.1),
            'fu.bn.running_mean': jnp.asarray(
                rs.randn(2 * c).astype(np.float32) * 0.1),
            'fu.bn.running_var': jnp.asarray(
                rs.rand(2 * c).astype(np.float32) + 0.5),
        }
        x = jnp.asarray(rs.randn(n, h, w, c).astype(np.float32))
        p = P(params).scope('fu')

        # reference formulation: interleave → one (2C,2C) conv → deinterleave
        re, im = lama._rfft2_matmul(x)
        stacked = jnp.stack([re, im], -1).reshape(n, h, w // 2 + 1, 2 * c)
        y = p.conv('conv_layer', stacked)
        y = relu(p.bn('bn', y))
        y = y.reshape(n, h, w // 2 + 1, c, 2)
        want = lama._irfft2_matmul(y[..., 0], y[..., 1], h, w)

        got = lama._fourier_unit(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_pallas_fu_matches_split_form(self):
        """Channel-major Pallas FourierUnit (interpret) vs the XLA split
        path."""
        import jax.numpy as jnp
        from manga_image_translator_tpu.models import lama
        from manga_image_translator_tpu.models.functional import P

        rs = np.random.RandomState(9)
        n, h, w, c = 1, 16, 32, 16
        params = {
            'fu.conv_layer.weight': jnp.asarray(
                rs.randn(1, 1, 2 * c, 2 * c).astype(np.float32) * 0.2),
            'fu.conv_layer.bias': jnp.asarray(
                rs.randn(2 * c).astype(np.float32) * 0.1),
            'fu.bn.weight': jnp.asarray(
                rs.rand(2 * c).astype(np.float32) + 0.5),
            'fu.bn.bias': jnp.asarray(
                rs.randn(2 * c).astype(np.float32) * 0.1),
            'fu.bn.running_mean': jnp.asarray(
                rs.randn(2 * c).astype(np.float32) * 0.1),
            'fu.bn.running_var': jnp.asarray(
                rs.rand(2 * c).astype(np.float32) + 0.5),
        }
        x = jnp.asarray(rs.randn(n, h, w, c).astype(np.float32))
        p = P(params).scope('fu')
        want = lama._fourier_unit(p, x)   # split XLA path (CPU: no pallas)
        got = lama._fourier_unit_pallas(p, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestFusedLocalConvs:
    def test_fused_l2l_l2g_matches_split(self, monkeypatch):
        """convl2l+convl2g as ONE output-channel-concatenated conv must
        reproduce the split-conv FFC exactly (same contractions, merely
        batched along N) — full small generator, folded-BN params."""
        params = lama.fold_bn(lama.init_params(n_blocks=2), n_blocks=2)
        rs = np.random.RandomState(7)
        img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
        mask = jnp.asarray(
            (rs.rand(1, 64, 64, 1) < 0.2).astype(np.float32))

        monkeypatch.setenv('MIT_TPU_LAMA_FUSE_LG', '0')
        want = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        monkeypatch.setenv('MIT_TPU_LAMA_FUSE_LG', '1')
        got = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fused_l2l_g2l_input_concat_matches_split(self, monkeypatch):
        """Mode 2: out_l as ONE conv over concat(x_l, x_g) must match
        convl2l(x_l)+convg2l(x_g) up to f32 accumulation-order noise."""
        params = lama.fold_bn(lama.init_params(n_blocks=2), n_blocks=2)
        rs = np.random.RandomState(11)
        img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
        mask = jnp.asarray(
            (rs.rand(1, 64, 64, 1) < 0.2).astype(np.float32))

        monkeypatch.setenv('MIT_TPU_LAMA_FUSE_LG', '0')
        want = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        monkeypatch.setenv('MIT_TPU_LAMA_FUSE_LG', '2')
        got = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_deconv_pack_matches_default(self, monkeypatch):
        """MIT_TPU_DECONV_PACK=1 routes LaMa's three k3/s2/p1/op1
        upsample transposed convs through the phase-packed form."""
        params = lama.fold_bn(lama.init_params(n_blocks=2), n_blocks=2)
        rs = np.random.RandomState(17)
        img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
        mask = jnp.asarray(
            (rs.rand(1, 64, 64, 1) < 0.2).astype(np.float32))

        monkeypatch.setenv('MIT_TPU_DECONV_PACK', '0')
        want = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        monkeypatch.setenv('MIT_TPU_DECONV_PACK', '1')
        got = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_fused_single_conv_zero_block_matches_split(self, monkeypatch):
        """Mode 3: all three local paths as ONE conv (zero g2g block)."""
        params = lama.fold_bn(lama.init_params(n_blocks=2), n_blocks=2)
        rs = np.random.RandomState(13)
        img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32))
        mask = jnp.asarray(
            (rs.rand(1, 64, 64, 1) < 0.2).astype(np.float32))

        monkeypatch.setenv('MIT_TPU_LAMA_FUSE_LG', '0')
        want = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        monkeypatch.setenv('MIT_TPU_LAMA_FUSE_LG', '3')
        got = np.asarray(lama.lama_generator_forward(
            params, img * (1 - mask), mask, n_blocks=2))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
