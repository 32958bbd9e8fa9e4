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


# ---------------------------------------------------------------------------
# 48px autoregressive OCR (default) — reference ocr/model_48px.py:505
# ---------------------------------------------------------------------------

def test_ocr48_full_model():
    """ConvNeXt backbone + 4 XPOS encoders + 4 KV-cached decode steps +
    char/color heads vs the reference torch OCR along its own INFERENCE
    path (next_token_batch) — the convention our decode_step mirrors."""
    import jax.numpy as jnp
    from manga_image_translator_tpu.models import ocr48
    from manga_image_translator_tpu.models.functional import P

    mod = ref_oracle.load('ocr.model_48px')
    seed_everything(11)
    net = mod.OCR([str(i) for i in range(48)], 25).eval()

    x = torch.randn(2, 3, 48, 64)
    widths = [64, 40]
    with torch.no_grad():
        memory = net.backbone(x).squeeze(2).permute(0, 2, 1)  # N W C
        input_mask = torch.zeros(2, memory.size(1), dtype=torch.bool)
        for i, l in enumerate([(w + 3) // 4 + 2 for w in widths]):
            input_mask[i, l:] = True
        for layer in net.encoders:
            memory = layer(layer, src=memory,
                           src_key_padding_mask=input_mask)
        hypos = [mod.Hypothesis(torch.device('cpu'), 1, 2, 0, i, 5, 320)
                 for i in range(2)]
        ref_decs = [mod.next_token_batch(hypos, memory, input_mask,
                                         net.decoders, net.embd)]
        forced = [[5, 9, 3], [7, 11, 4]]
        for t in range(3):
            hypos = [h.extend(torch.tensor(forced[i][t]),
                              torch.tensor(0.0))
                     for i, h in enumerate(hypos)]
            mm = torch.stack([input_mask[h.memory_idx] for h in hypos])
            ref_decs.append(mod.next_token_batch(hypos, memory, mm,
                                                 net.decoders, net.embd))
        ref_logits = net.pred(net.pred1(ref_decs[0]))
        cf = net.color_pred1(ref_decs[0])
        ref_fg, ref_bg = net.color_pred_fg(cf), net.color_pred_bg(cf)

    params = convert_state_dict(
        net.state_dict(), embedding_patterns=ocr48.EMBEDDING_PATTERNS)
    mem_j = ocr48.convnext_features(P(params).scope('backbone'),
                                    nhwc_in(x))
    assert mem_j.shape == tuple(memory.shape), (mem_j.shape, memory.shape)
    mask_j = jnp.asarray(input_mask.numpy())
    mem_j = ocr48.encoder_forward(params, mem_j, mask_j)
    np.testing.assert_allclose(np.asarray(mem_j), memory.numpy(),
                               rtol=1e-3, atol=2e-3)

    caches = ocr48.init_caches(params, mem_j, 2, 8)
    toks = [jnp.asarray([1, 1])] + [
        jnp.asarray([forced[0][t], forced[1][t]]) for t in range(3)]
    for step, tok in enumerate(toks):
        dec, caches = ocr48.decode_step(params, caches, tok,
                                        jnp.int32(step), mask_j)
        np.testing.assert_allclose(np.asarray(dec),
                                   ref_decs[step].numpy(),
                                   rtol=1e-3, atol=2e-3)
        if step == 0:
            wout = params['embd.weight'].T
            lp_ref = torch.log_softmax(ref_logits, dim=-1).numpy()
            lp = np.asarray(ocr48.char_logprobs(params, dec, wout))
            np.testing.assert_allclose(lp, lp_ref, rtol=1e-3, atol=2e-3)
            fg, bg, _, _ = ocr48.color_predictions(params, dec)
            np.testing.assert_allclose(np.asarray(fg), ref_fg.numpy(),
                                       rtol=1e-3, atol=2e-3)
            np.testing.assert_allclose(np.asarray(bg), ref_bg.numpy(),
                                       rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# 48px CTC OCR — reference ocr/model_48px_ctc.py:425
# ---------------------------------------------------------------------------

def test_ocr48_ctc_full_model():
    import jax
    from manga_image_translator_tpu.models import ocr48_ctc

    mod = ref_oracle.load('ocr.model_48px_ctc')
    seed_everything(13)
    net = mod.OCR([str(i) for i in range(48)], 25).eval()
    randomize_bn(net)

    x = torch.randn(2, 3, 48, 64)
    with torch.no_grad():
        ref_logits, ref_colors = net(x)
        ref_lp = torch.log_softmax(ref_logits, dim=2)
        ref_colors = ref_colors.clamp(0, 1)

    params = convert_state_dict(net.state_dict())
    lp, colors = jax.jit(ocr48_ctc.ctc_forward)(params, nhwc_in(x))
    np.testing.assert_allclose(np.asarray(lp), ref_lp.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(colors), ref_colors.numpy(),
                               rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# 32px OCR — reference ocr/model_32px.py:19
# ---------------------------------------------------------------------------

def test_ocr32_full_model():
    """ResNet backbone + PE encoders + 3 cached decode steps + char/color
    heads vs the reference torch OCR along its inference path
    (next_token_batch, post-LN layers)."""
    import jax.numpy as jnp
    from manga_image_translator_tpu.models import ocr32
    from manga_image_translator_tpu.models.functional import P

    mod = ref_oracle.load('ocr.model_32px')
    seed_everything(17)
    net = mod.OCR([str(i) for i in range(48)], 100).eval()
    randomize_bn(net)

    x = torch.randn(2, 3, 32, 64)
    widths = [64, 40]
    with torch.no_grad():
        feats = net.backbone(x)
        feats = torch.einsum('n e h s -> s n e', feats)
        input_mask = torch.zeros(2, feats.size(0), dtype=torch.bool)
        for i, l in enumerate([(w + 3) // 4 + 2 for w in widths]):
            input_mask[i, l:] = True
        feats = net.pe(feats)
        memory = net.encoders(feats, src_key_padding_mask=input_mask)
        hypos = [mod.Hypothesis(torch.device('cpu'), 1, 2, 0, i,
                                net.decoders.num_layers, 320)
                 for i in range(2)]
        ref_decs = [mod.next_token_batch(hypos, memory, input_mask,
                                         net.decoders, net.pe, net.embd)]
        forced = [[5, 9], [7, 11]]
        for t in range(2):
            hypos = [h.extend(torch.tensor(forced[i][t]),
                              torch.tensor(0.0))
                     for i, h in enumerate(hypos)]
            mm = torch.stack([input_mask[h.memory_idx] for h in hypos])
            ref_decs.append(mod.next_token_batch(hypos, memory, mm,
                                                 net.decoders, net.pe,
                                                 net.embd))
        ref_lp = torch.log_softmax(
            net.pred(net.pred1(ref_decs[0])), dim=-1)
        cf = net.color_pred1(ref_decs[0])
        ref_cols = torch.cat([net.fg_r_pred(cf), net.fg_g_pred(cf),
                              net.fg_b_pred(cf), net.bg_r_pred(cf),
                              net.bg_g_pred(cf), net.bg_b_pred(cf)],
                             dim=-1)

    params = convert_state_dict(
        net.state_dict(), embedding_patterns=ocr32.EMBEDDING_PATTERNS)
    mem_j = ocr32.resnet_features(P(params).scope('backbone.ConvNet'),
                                  nhwc_in(x))
    assert mem_j.shape == (2, memory.shape[0], 320), mem_j.shape
    mask_j = jnp.asarray(input_mask.numpy())
    mem_j = ocr32.encoder_forward(params, mem_j, mask_j)
    np.testing.assert_allclose(
        np.asarray(mem_j), memory.permute(1, 0, 2).numpy(),
        rtol=1e-3, atol=2e-3)

    caches = ocr32.init_caches(params, mem_j, 2, 8)
    toks = [jnp.asarray([1, 1])] + [
        jnp.asarray([forced[0][t], forced[1][t]]) for t in range(2)]
    for step, tok in enumerate(toks):
        dec, caches = ocr32.decode_step(params, caches, tok,
                                        jnp.int32(step), mask_j)
        np.testing.assert_allclose(np.asarray(dec),
                                   ref_decs[step].numpy(),
                                   rtol=1e-3, atol=2e-3)
    lp = np.asarray(ocr32.char_logprobs(
        params, jnp.asarray(ref_decs[0].numpy())))
    np.testing.assert_allclose(lp, ref_lp.numpy(), rtol=1e-3, atol=2e-3)
    cols = np.asarray(ocr32.color_predictions(
        params, jnp.asarray(ref_decs[0].numpy())))
    np.testing.assert_allclose(cols, ref_cols.numpy(),
                               rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# ComicTextDetector — reference detection/ctd_utils/basemodel.py:216
# ---------------------------------------------------------------------------

def test_ctd_full_model():
    """yolov5s backbone (Focus/C3/SPP) + UnetHead + DBHead vs the
    reference TextDetBase composition (blk_det -> text_seg inference mode
    -> text_det), leaky heads as the production checkpoint uses."""
    import jax
    from manga_image_translator_tpu.models import ctd as ctd_model

    yolo_mod = ref_oracle.load('detection.ctd_utils.yolov5.yolo')
    base_mod = ref_oracle.load('detection.ctd_utils.basemodel')
    seed_everything(19)

    cfg = {
        'nc': 80, 'depth_multiple': 0.33, 'width_multiple': 0.50,
        'anchors': [[10, 13, 16, 30, 33, 23],
                    [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]],
        'backbone': [
            [-1, 1, 'Focus', [64, 3]], [-1, 1, 'Conv', [128, 3, 2]],
            [-1, 3, 'C3', [128]], [-1, 1, 'Conv', [256, 3, 2]],
            [-1, 9, 'C3', [256]], [-1, 1, 'Conv', [512, 3, 2]],
            [-1, 9, 'C3', [512]], [-1, 1, 'Conv', [1024, 3, 2]],
            [-1, 1, 'SPP', [1024, [5, 9, 13]]],
            [-1, 3, 'C3', [1024, False]]],
        'head': [
            [-1, 1, 'Conv', [512, 1, 1]],
            [-1, 1, 'nn.Upsample', [None, 2, 'nearest']],
            [[-1, 6], 1, 'Concat', [1]], [-1, 3, 'C3', [512, False]],
            [-1, 1, 'Conv', [256, 1, 1]],
            [-1, 1, 'nn.Upsample', [None, 2, 'nearest']],
            [[-1, 4], 1, 'Concat', [1]], [-1, 3, 'C3', [256, False]],
            [-1, 1, 'Conv', [256, 3, 2]], [[-1, 14], 1, 'Concat', [1]],
            [-1, 3, 'C3', [512, False]], [-1, 1, 'Conv', [512, 3, 2]],
            [[-1, 10], 1, 'Concat', [1]], [-1, 3, 'C3', [1024, False]],
            [[17, 20, 23], 1, 'Detect', ['nc', 'anchors']]],
    }
    backbone = yolo_mod.Model(cfg).float().eval()
    backbone.out_indices = [1, 3, 5, 7, 9]
    backbone.model = backbone.model[:10]
    seg = base_mod.UnetHead(act='leaky').eval()
    db = base_mod.DBHead(64, act='leaky').eval()
    for m in (backbone, seg, db):
        randomize_bn(m)

    rng = np.random.default_rng(19)
    x = torch.from_numpy(rng.random((1, 3, 256, 256)).astype(np.float32))
    with torch.no_grad():
        outs = backbone(x)
        ref_mask, feats = seg(*outs,
                              forward_mode=base_mod.TEXTDET_INFERENCE)
        ref_lines = db(*feats, step_eval=False)

    flat = {}
    for prefix, mod in (('blk_det', backbone), ('text_seg', seg),
                        ('text_det', db)):
        for k, v in mod.state_dict().items():
            flat[f'{prefix}.{k}'] = v
    params = convert_state_dict(
        flat, transposed_conv_patterns=ctd_model.TRANSPOSED_CONV_PATTERNS)
    mask, lines = jax.jit(ctd_model.ctd_forward)(params, nhwc_in(x))
    np.testing.assert_allclose(nchw(mask), ref_mask.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(nchw(lines), ref_lines.numpy(),
                               rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Stable Diffusion inpaint stack — official ldm key space
# (reference inpainting/ldm/modules/..., loaded via inpainting_sd.py:47)
# ---------------------------------------------------------------------------

def test_sd_unet_full_model():
    """9-channel inpaint UNet vs the reference ldm UNetModel at tiny dims:
    the state dict carries the OFFICIAL 'model.diffusion_model.*' key
    space, so a real safetensors load exercises exactly this mapping
    (VERDICT r2 next-round #5a)."""
    import jax
    from manga_image_translator_tpu.models import sd

    mod = ref_oracle.load(
        'inpainting.ldm.modules.diffusionmodules.openaimodel')
    seed_everything(23)
    cfg = sd.SDConfig.tiny()
    net = mod.UNetModel(
        image_size=32, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions,
        channel_mult=cfg.channel_mult, num_heads=cfg.num_heads,
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=cfg.context_dim, legacy=False).eval()

    rng = np.random.default_rng(23)
    x = torch.from_numpy(rng.standard_normal((1, 9, 16, 16)).astype(
        np.float32))
    t = torch.tensor([7.0])
    ctx = torch.from_numpy(rng.standard_normal((1, 5, cfg.context_dim))
                           .astype(np.float32))
    with torch.no_grad():
        ref = net(x, timesteps=t, context=ctx)

    flat = {f'model.diffusion_model.{k}': v
            for k, v in net.state_dict().items()}
    params = convert_state_dict(flat,
                                embedding_patterns=sd.EMBEDDING_PATTERNS)
    out = jax.jit(lambda p, x, t, c: sd.unet_forward(p, x, t, c, cfg))(
        params, nhwc_in(x), jnp.asarray([7.0]),
        jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(nchw(out), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_sd_vae_full_model():
    """AutoencoderKL encoder/decoder vs the reference ldm modules under
    the official 'first_stage_model.*' key space."""
    import jax
    from manga_image_translator_tpu.models import sd

    mod = ref_oracle.load('inpainting.ldm.modules.diffusionmodules.model')
    seed_everything(29)
    cfg = sd.SDConfig.tiny()
    enc = mod.Encoder(ch=cfg.vae_channels, out_ch=3,
                      ch_mult=cfg.vae_ch_mult,
                      num_res_blocks=cfg.vae_num_res, attn_resolutions=[],
                      in_channels=3, resolution=32,
                      z_channels=cfg.z_channels, double_z=True).eval()
    dec = mod.Decoder(ch=cfg.vae_channels, out_ch=3,
                      ch_mult=cfg.vae_ch_mult,
                      num_res_blocks=cfg.vae_num_res, attn_resolutions=[],
                      in_channels=3, resolution=32,
                      z_channels=cfg.z_channels).eval()
    quant = torch.nn.Conv2d(2 * cfg.z_channels, 2 * cfg.z_channels, 1)
    post_quant = torch.nn.Conv2d(cfg.z_channels, cfg.z_channels, 1)

    rng = np.random.default_rng(29)
    x = torch.from_numpy(
        (rng.random((1, 3, 16, 16)) * 2 - 1).astype(np.float32))
    z = torch.from_numpy(rng.standard_normal(
        (1, cfg.z_channels, 8, 8)).astype(np.float32))
    with torch.no_grad():
        ref_moments = quant(enc(x))
        ref_img = dec(post_quant(z))

    flat = {}
    for prefix, m in (('encoder', enc), ('decoder', dec),
                      ('quant_conv', quant), ('post_quant_conv',
                                              post_quant)):
        for k, v in m.state_dict().items():
            key = f'first_stage_model.{prefix}.{k}' if k else prefix
            flat[key] = v
    # nn.Conv2d state dicts have bare 'weight'/'bias' keys
    flat = {k.rstrip('.'): v for k, v in flat.items()}
    params = convert_state_dict(flat,
                                embedding_patterns=sd.EMBEDDING_PATTERNS)
    moments = jax.jit(lambda p, x: sd.vae_encode_moments(p, x, cfg))(
        params, nhwc_in(x))
    np.testing.assert_allclose(nchw(moments), ref_moments.numpy(),
                               rtol=2e-3, atol=2e-3)
    img = jax.jit(lambda p, z: sd.vae_decode(p, z, cfg))(
        params, nhwc_in(z) * cfg.scale_factor)
    np.testing.assert_allclose(nchw(img), ref_img.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_sd_clip_full_model():
    """CLIP text encoder vs the real transformers CLIPTextModel under the
    official 'cond_stage_model.transformer.*' key space."""
    import jax
    from manga_image_translator_tpu.models import sd
    transformers = pytest.importorskip('transformers')

    seed_everything(31)
    cfg = sd.SDConfig.tiny()
    tcfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.text_width,
        intermediate_size=cfg.text_width * 4,
        num_hidden_layers=cfg.text_layers,
        num_attention_heads=cfg.text_heads,
        max_position_embeddings=cfg.max_tokens,
        hidden_act='quick_gelu')
    net = transformers.CLIPTextModel(tcfg).eval()

    rng = np.random.default_rng(31)
    toks = rng.integers(0, cfg.vocab_size, (2, cfg.max_tokens))
    with torch.no_grad():
        ref = net(input_ids=torch.from_numpy(toks)).last_hidden_state

    flat = {f'cond_stage_model.transformer.{k}': v
            for k, v in net.state_dict().items()}
    params = convert_state_dict(flat,
                                embedding_patterns=sd.EMBEDDING_PATTERNS)
    out = jax.jit(lambda p, t: sd.clip_text_forward(p, t, cfg))(
        params, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# DBNet-ConvNeXt (dbconvnext detector) — the reference ships NO checkpoint
# for this arch (empty URL, reference detection/dbnet_convnext.py:513-517),
# so this oracle is the only possible end-to-end verification: seeded torch
# weights through the converter vs the reference forward (timm.layers is
# shimmed functionally in ref_oracle._build_timm).
# ---------------------------------------------------------------------------

def test_dbnet_convnext_full_model():
    import jax
    from manga_image_translator_tpu.models import dbnet_convnext

    mod = ref_oracle.load('detection.dbnet_convnext')
    seed_everything(4)
    net = mod.DBNetConvNext().eval()
    # perturb LN affine + layer-scale gammas so identity-init can't hide
    # conversion bugs in those leaves
    with torch.no_grad():
        for name, p in net.named_parameters():
            if p.ndim == 1:
                p.add_(torch.randn_like(p) * 0.05)

    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        ref_db, ref_mask = net(x)

    params = convert_state_dict(
        net.state_dict(),
        transposed_conv_patterns=dbnet_convnext.TRANSPOSED_CONV_PATTERNS)
    # converted params must cover exactly the random-init key space
    assert set(params) == set(dbnet_convnext.init_params()), (
        set(params) ^ set(dbnet_convnext.init_params()))
    db, mask = jax.jit(dbnet_convnext.dbnet_convnext_forward)(
        params, nhwc_in(x))
    np.testing.assert_allclose(nchw(db), ref_db.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(nchw(mask), ref_mask.numpy(),
                               rtol=1e-3, atol=2e-3)
