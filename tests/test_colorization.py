import asyncio

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp


class TestMc2Model:
    def test_ffdnet_roundtrip_shapes(self):
        from manga_image_translator_tpu.models import mc2
        params = mc2.init_ffdnet_params()
        x = jnp.zeros((1, 64, 64, 3))
        noise = mc2.ffdnet_rgb_forward(params, x,
                                       jnp.asarray([0.1], jnp.float32))
        assert noise.shape == (1, 64, 64, 3)

    def test_space_depth_roundtrip(self):
        from manga_image_translator_tpu.models import mc2
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(1, 8, 8, 3).astype(np.float32))
        down = mc2._space_to_depth2(x)
        assert down.shape == (1, 4, 4, 12)
        up = mc2._depth_to_space2(down)
        np.testing.assert_allclose(np.asarray(up), np.asarray(x))

    def test_pixel_shuffle_matches_torch(self):
        import torch
        from manga_image_translator_tpu.models.mc2 import _pixel_shuffle2
        rs = np.random.RandomState(1)
        x = rs.rand(1, 8, 3, 4).astype(np.float32)  # NCHW: (1, 8ch, 3, 4)
        ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2)
        ours = _pixel_shuffle2(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-6)

    def test_generator_shapes(self):
        from manga_image_translator_tpu.models import mc2
        params = mc2.init_generator_params()
        sketch = jnp.zeros((1, 64, 64, 5))
        fake, guide = mc2.generator_forward(params, sketch)
        assert fake.shape == (1, 64, 64, 3)
        assert float(jnp.max(jnp.abs(fake))) <= 1.0


def test_colorization_dispatch_smoke():
    from manga_image_translator_tpu.colorization import Colorizer, dispatch
    img = Image.fromarray(
        np.random.randint(0, 255, (96, 80, 3), dtype=np.uint8))
    out = asyncio.run(dispatch(Colorizer.mc2, device='cpu', image=img,
                               colorization_size=64, denoise_sigma=25))
    assert isinstance(out, Image.Image)
    assert out.size[0] > 0
