"""Upscaling backends: Real-ESRGAN checkpoint-name conversion."""
import numpy as np


class TestRealESRGANConversion:
    def test_new_style_naming_maps_to_forward(self):
        """Synthetic new-style (Real-ESRGAN) state dict converts and runs
        through esrgan_forward."""
        import torch
        import jax.numpy as jnp
        from manga_image_translator_tpu.models import esrgan as m
        from manga_image_translator_tpu.upscaling.esrgan import (
            convert_realesrgan_state_dict)

        nf, gc, nb = 8, 4, 2
        rs = np.random.RandomState(0)

        def t(*shape):
            return torch.from_numpy(rs.randn(*shape).astype(np.float32)
                                    * 0.05)

        sd = {'conv_first.weight': t(nf, 3, 3, 3),
              'conv_first.bias': t(nf)}
        for i in range(nb):
            for j in (1, 2, 3):
                for k in (1, 2, 3, 4, 5):
                    cin = nf + (k - 1) * gc
                    cout = gc if k < 5 else nf
                    sd[f'body.{i}.rdb{j}.conv{k}.weight'] = t(cout, cin, 3, 3)
                    sd[f'body.{i}.rdb{j}.conv{k}.bias'] = t(cout)
        for name in ('conv_body', 'conv_up1', 'conv_up2', 'conv_hr'):
            sd[f'{name}.weight'] = t(nf, nf, 3, 3)
            sd[f'{name}.bias'] = t(nf)
        sd['conv_last.weight'] = t(3, nf, 3, 3)
        sd['conv_last.bias'] = t(3)

        params = convert_realesrgan_state_dict({'params_ema': sd})
        assert m.detect_nb(params) == nb
        x = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
        out = m.esrgan_forward(params, x, nb=nb)
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestWaifu2xNcnn:
    def _write_model(self, tmp_path, rs):
        """Synthesize an upconv_7 ncnn .param/.bin pair."""
        from manga_image_translator_tpu.models.waifu2x import (
            UPCONV7_CHANNELS)
        lines = ['7767517', '9 9', 'Input input 0 1 input']
        blobs = []
        prev = 'input'
        for i, (co, ci) in enumerate(UPCONV7_CHANNELS):
            wsize = co * ci * 9
            lines.append(
                f'Convolution conv{i} 1 1 {prev} c{i} 0={co} 1=3 5=1 '
                f'6={wsize}')
            blobs.append(np.zeros(1, np.uint32).tobytes())
            blobs.append((rs.randn(wsize).astype(np.float32) * 0.05)
                         .tobytes())
            blobs.append((rs.randn(co).astype(np.float32) * 0.01).tobytes())
            prev = f'c{i}'
        wsize = 256 * 3 * 16
        lines.append(f'Deconvolution up 1 1 {prev} out 0=3 1=4 3=2 4=3 '
                     f'5=1 6={wsize}')
        blobs.append(np.zeros(1, np.uint32).tobytes())
        blobs.append((rs.randn(wsize).astype(np.float32) * 0.05).tobytes())
        blobs.append((rs.randn(3).astype(np.float32) * 0.01).tobytes())
        param = tmp_path / 'm.param'
        binf = tmp_path / 'm.bin'
        param.write_text('\n'.join(lines) + '\n')
        binf.write_bytes(b''.join(blobs))
        return param, binf

    def test_ncnn_roundtrip_and_forward(self, tmp_path):
        import jax.numpy as jnp
        from manga_image_translator_tpu.models import waifu2x as w2x
        rs = np.random.RandomState(3)
        param, binf = self._write_model(tmp_path, rs)
        params = w2x.load_ncnn_upconv7(param, binf)
        assert params['conv0.weight'].shape == (3, 3, 3, 16)
        assert params['deconv.weight'].shape == (4, 4, 3, 256)
        x = jnp.asarray(rs.rand(1, 24 + 14, 20 + 14, 3).astype(np.float32))
        out = w2x.upconv7_forward(params, x)
        assert out.shape == (1, 48, 40, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_deconv_matches_manual_transposed_conv(self):
        """The deconv convention must equal torch ConvTranspose2d
        (stride 2, pad 3): verified against a direct numpy scatter."""
        import jax.numpy as jnp
        from manga_image_translator_tpu.models import waifu2x as w2x
        rs = np.random.RandomState(1)
        params = w2x.init_params()
        # single-channel probe through the full net is hard; test the
        # deconv alone by overriding the forward's input
        cin, cout, k, s_, pad = 256, 3, 4, 2, 3
        w_t = rs.randn(cin, cout, k, k).astype(np.float32) * 0.1  # torch IOHW
        x = rs.randn(1, 6, 5, cin).astype(np.float32)

        # numpy reference: torch-style transposed conv
        oh = (6 - 1) * s_ + k - 2 * pad
        ow = (5 - 1) * s_ + k - 2 * pad
        full = np.zeros((oh + 2 * pad, ow + 2 * pad, cout), np.float32)
        for y in range(6):
            for xx in range(5):
                for ky in range(k):
                    for kx in range(k):
                        full[y * s_ + ky, xx * s_ + kx] += (
                            x[0, y, xx] @ w_t[:, :, ky, kx])
        want = full[pad:pad + oh, pad:pad + ow]

        p2 = dict(params)
        p2['deconv.weight'] = jnp.asarray(w_t.transpose(2, 3, 1, 0))
        p2['deconv.bias'] = jnp.zeros((cout,), jnp.float32)
        # run just the deconv tail: feed x directly
        w = p2['deconv.weight']
        y = __import__('jax').lax.conv_transpose(
            jnp.asarray(x), w, (2, 2), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            transpose_kernel=True)[:, 3:-3, 3:-3, :]
        np.testing.assert_allclose(np.asarray(y)[0], want, rtol=2e-4,
                                   atol=2e-4)
