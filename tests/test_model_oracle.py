"""Full-model parity vs the REFERENCE torch implementations.

Each test instantiates the reference nn.Module from /root/reference with
seeded random weights (+ randomized BN running stats so norm-folding bugs
can't hide), converts its state_dict through this framework's converter,
runs the JAX forward, and asserts end-to-end output closeness.

This is the "converter verified per-MODEL" gate (SURVEY.md §7.2/§7.10):
it validates both the architecture re-implementation and the weight
conversion without network access or released checkpoints.

Tolerances: fp32 end-to-end through deep CNNs accumulates ~1e-4 of
divergence from conv-algorithm and reduction-order differences between
torch (oneDNN) and XLA:CPU; atol/rtol are set per-model at the observed
headroom ×10.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp

import ref_oracle
from manga_image_translator_tpu.models.torch_loader import convert_state_dict


def seed_everything(seed=0):
    torch.manual_seed(seed)
    np.random.seed(seed)


def randomize_bn(model):
    """Fresh BN running stats are (0, 1) which makes normalization nearly
    a no-op; randomize them so conversion errors in the stats can't hide."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)


def nchw(x_nhwc):
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def nhwc_in(x_torch):
    return jnp.asarray(x_torch.permute(0, 2, 3, 1).numpy())


# ---------------------------------------------------------------------------
# DBNet-ResNet34 (default detector)
# ---------------------------------------------------------------------------

def test_dbnet_full_model():
    from manga_image_translator_tpu.models import dbnet

    mod = ref_oracle.load('detection.default_utils.DBNet_resnet34')
    seed_everything(0)
    net = mod.TextDetection(pretrained=None).eval()
    randomize_bn(net)

    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        ref_db, ref_mask = net(x)

    params = convert_state_dict(
        net.state_dict(),
        transposed_conv_patterns=dbnet.TRANSPOSED_CONV_PATTERNS)
    db, mask = dbnet_jit(params, nhwc_in(x))
    np.testing.assert_allclose(nchw(db), ref_db.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(nchw(mask), ref_mask.numpy(),
                               rtol=1e-3, atol=2e-3)


def dbnet_jit(params, x):
    import jax
    from manga_image_translator_tpu.models.dbnet import dbnet_forward
    return jax.jit(dbnet_forward)(params, x)


# ---------------------------------------------------------------------------
# LaMa (FFC generator, 9 and 18 blocks)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('large', [False, True])
def test_lama_full_model(large):
    import jax
    from manga_image_translator_tpu.models import lama

    mod = ref_oracle.load('inpainting.inpainting_lama_mpe')
    seed_everything(1)
    model = mod.LamaFourier(build_discriminator=False, use_mpe=False,
                            large_arch=large)
    gen = model.generator.eval()
    randomize_bn(gen)
    n_blocks = 18 if large else 9

    rng = np.random.default_rng(1)
    img = torch.from_numpy(rng.random((1, 3, 64, 64), np.float32))
    mask = torch.zeros(1, 1, 64, 64)
    mask[:, :, 16:40, 20:52] = 1.0
    with torch.no_grad():
        ref = gen(img, mask)

    params = convert_state_dict(
        gen.state_dict(),
        transposed_conv_patterns=lama.TRANSPOSED_CONV_PATTERNS_FOR_BLOCKS[
            n_blocks])
    img_j = nhwc_in(img) * (1.0 - nhwc_in(mask))
    out = jax.jit(lambda p, i, m: lama.lama_generator_forward(
        p, i, m, n_blocks=n_blocks))(params, img_j, nhwc_in(mask))
    np.testing.assert_allclose(nchw(out), ref.numpy(), rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# AOT-GAN generator
# ---------------------------------------------------------------------------

def test_aot_full_model():
    import jax
    from manga_image_translator_tpu.models import aot

    mod = ref_oracle.load('inpainting.inpainting_aot')
    seed_everything(2)
    net = mod.AOTGenerator().eval()

    rng = np.random.default_rng(2)
    # AOT blocks dilate up to 8 with matching reflection padding, so the
    # bottleneck (input/4) must be larger than 16px each side.
    img = torch.from_numpy(
        (rng.random((1, 3, 128, 128), np.float32) * 2 - 1))
    mask = torch.zeros(1, 1, 128, 128)
    mask[:, :, 16:96, 32:112] = 1.0
    with torch.no_grad():
        ref = net(img * (1 - mask), mask)

    params = convert_state_dict(
        net.state_dict(),
        transposed_conv_patterns=aot.TRANSPOSED_CONV_PATTERNS)
    out = jax.jit(aot.aot_generator_forward)(
        params, nhwc_in(img) * (1.0 - nhwc_in(mask)), nhwc_in(mask))
    np.testing.assert_allclose(nchw(out), ref.numpy(), rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# ESRGAN (RRDBNet)
# ---------------------------------------------------------------------------

def test_esrgan_full_model():
    import jax
    from manga_image_translator_tpu.models import esrgan

    mod = ref_oracle.load('upscaling.esrgan_pytorch')
    seed_everything(3)
    net = mod.RRDBNet(3, 3, 64, 6, gc=32).eval()

    rng = np.random.default_rng(3)
    x = torch.from_numpy(rng.random((1, 3, 24, 24), np.float32))
    with torch.no_grad():
        ref = net(x)

    params = convert_state_dict(net.state_dict())
    out = jax.jit(lambda p, x: esrgan.esrgan_forward(p, x, nb=6))(
        params, nhwc_in(x))
    np.testing.assert_allclose(nchw(out), ref.numpy(), rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# manga-colorization-v2: Generator + FFDNet denoiser
# ---------------------------------------------------------------------------

def test_mc2_generator_full_model():
    import jax
    from manga_image_translator_tpu.models import mc2

    mod = ref_oracle.load(
        'colorization.manga_colorization_v2_utils.networks.models')
    seed_everything(4)
    net = mod.Generator().eval()
    randomize_bn(net)

    rng = np.random.default_rng(4)
    sketch = torch.from_numpy(
        (rng.random((1, 5, 64, 64), np.float32) * 2 - 1))
    with torch.no_grad():
        ref_fake, ref_guide = net(sketch)

    params = convert_state_dict(
        net.state_dict(),
        transposed_conv_patterns=mc2.GENERATOR_TRANSPOSED_PATTERNS)
    out = jax.jit(mc2.generator_forward)(params, nhwc_in(sketch))
    fake = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(nchw(fake), ref_fake.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_mc2_ffdnet_full_model():
    import jax
    from manga_image_translator_tpu.models import mc2

    mod = ref_oracle.load(
        'colorization.manga_colorization_v2_utils.denoising.models')
    seed_everything(5)
    net = mod.FFDNet(num_input_channels=3).eval()

    rng = np.random.default_rng(5)
    img = torch.from_numpy(rng.random((1, 3, 64, 64), np.float32))
    sigma = 25.0 / 255.0
    with torch.no_grad():
        noise_sigma = torch.FloatTensor([sigma])
        ref = net(img, noise_sigma)

    params = convert_state_dict(net.state_dict())
    # reference forward returns the predicted NOISE map (denoiser.py
    # subtracts it afterwards) — compare at that level.
    out = jax.jit(lambda p, x: mc2.ffdnet_rgb_forward(
        p, x, jnp.asarray([sigma], jnp.float32)))(params, nhwc_in(img))
    np.testing.assert_allclose(nchw(out), ref.numpy(), rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# CRAFT + RefineNet
# ---------------------------------------------------------------------------

def test_craft_full_model():
    import jax
    from manga_image_translator_tpu.models import craft as craft_jax

    mod = ref_oracle.load('detection.craft')
    seed_everything(6)
    net = mod.CRAFT().eval()
    randomize_bn(net)

    rng = np.random.default_rng(6)
    x = torch.from_numpy(rng.standard_normal((1, 3, 64, 64)).astype(
        np.float32))
    with torch.no_grad():
        ref_y, ref_feat = net(x)

    params = convert_state_dict(net.state_dict())
    y, feat = jax.jit(craft_jax.craft_forward)(params, nhwc_in(x))
    # reference returns y already permuted to NHWC; feature stays NCHW.
    np.testing.assert_allclose(np.asarray(y), ref_y.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(nchw(feat), ref_feat.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_craft_refiner_full_model():
    import jax
    from manga_image_translator_tpu.models import craft as craft_jax

    craft_mod = ref_oracle.load('detection.craft')
    refiner_mod = ref_oracle.load('detection.craft_utils.refiner')
    seed_everything(7)
    net = craft_mod.CRAFT().eval()
    refiner = refiner_mod.RefineNet().eval()
    randomize_bn(net)
    randomize_bn(refiner)

    rng = np.random.default_rng(7)
    x = torch.from_numpy(rng.standard_normal((1, 3, 64, 64)).astype(
        np.float32))
    with torch.no_grad():
        ref_y, ref_feat = net(x)
        ref_refined = refiner(ref_y, ref_feat)

    params = convert_state_dict(net.state_dict())
    rparams = convert_state_dict(refiner.state_dict())
    y, feat = jax.jit(craft_jax.craft_forward)(params, nhwc_in(x))
    refined = jax.jit(craft_jax.refiner_forward)(rparams, y, feat)
    np.testing.assert_allclose(
        np.asarray(refined).transpose(0, 3, 1, 2)
        if refined.ndim == 4 and refined.shape[-1] == ref_refined.shape[1]
        else np.asarray(refined),
        ref_refined.numpy(), rtol=1e-3, atol=2e-3)
