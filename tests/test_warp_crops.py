"""Device-batched OCR crops (ops/warp crop_plan_* + crop_batch) vs the
host cv2 path (Quadrilateral/TextBlock.get_transformed_region)."""
import numpy as np
import jax.numpy as jnp
import pytest

from manga_image_translator_tpu.ops import warp
from manga_image_translator_tpu.utils.geometry import Quadrilateral
from manga_image_translator_tpu.utils.textblock import TextBlock

TH = 48


def _page(h=400, w=600, seed=0):
    rs = np.random.RandomState(seed)
    # smooth image: low-freq gradient + mild noise so interpolation
    # differences stay sub-pixel-scale
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 0.3 + yy * 0.2) % 256
    img = np.stack([base, 255 - base, (xx * 0.1) % 256], -1)
    img += rs.randn(h, w, 3) * 3
    return np.clip(img, 0, 255).astype(np.uint8)


def _compare(img, quad, direction):
    host = quad.get_transformed_region(img, direction, TH)
    w, H = warp.crop_plan_quad(quad, direction, TH)
    assert host.shape == (TH, w, 3), (host.shape, w)
    dev = np.asarray(warp.crop_batch(
        jnp.asarray(img), jnp.asarray(H[None]),
        jnp.asarray([w], np.int32), out_h=TH, out_w=w))[0]
    dev_u8 = (dev + 1.0) * 127.5
    diff = np.abs(dev_u8 - host.astype(np.float32))
    # interiors must agree closely; borders differ by one-pixel padding
    # semantics so compare the central region
    inner = diff[2:-2, 2:-2]
    assert inner.mean() < 3.0, inner.mean()
    return host, dev_u8


def test_horizontal_axis_aligned():
    img = _page()
    quad = Quadrilateral(np.array([[50, 100], [350, 100],
                                   [350, 160], [50, 160]]), '', 0.9)
    _compare(img, quad, 'h')


def test_rotated_quad():
    img = _page()
    c, s = np.cos(0.2), np.sin(0.2)
    R = np.array([[c, -s], [s, c]])
    base = np.array([[-120, -25], [120, -25], [120, 25], [-120, 25]])
    pts = (base @ R.T + np.array([300, 200])).astype(np.float64)
    quad = Quadrilateral(pts, '', 0.9)
    _compare(img, quad, 'h')


def test_vertical_rotation_semantics():
    """Vertical crops must equal the host's rectify-then-rotate-CCW."""
    img = _page()
    quad = Quadrilateral(np.array([[200, 40], [260, 40],
                                   [260, 340], [200, 340]]), '', 0.9)
    host, dev = _compare(img, quad, 'v')
    assert host.shape[0] == TH and host.shape[1] > TH


def test_quad_partially_outside_page():
    img = _page()
    quad = Quadrilateral(np.array([[-30, 100], [200, 100],
                                   [200, 150], [-30, 150]]), '', 0.9)
    host, dev = _compare(img, quad, 'h')
    # out-of-page area is zero-padded on both paths
    assert host[:, :4].mean() < 5
    assert dev[:, :4].mean() < 5


def test_textblock_line_plan():
    img = _page()
    lines = [np.array([[60, 60], [300, 60], [300, 110], [60, 110]])]
    blk = TextBlock(lines=[l.tolist() for l in lines])
    blk.src_is_vertical = False
    host = blk.get_transformed_region(img, 0, TH)
    w, H = warp.crop_plan_textblock(blk, 0, TH)
    assert host.shape == (TH, w, 3)
    dev = np.asarray(warp.crop_batch(
        jnp.asarray(img), jnp.asarray(H[None]),
        jnp.asarray([w], np.int32), out_h=TH, out_w=w))[0]
    dev_u8 = (dev + 1.0) * 127.5
    assert np.abs(dev_u8[2:-2, 2:-2]
                  - host[2:-2, 2:-2].astype(np.float32)).mean() < 3.0


def test_degenerate_quad_is_blank():
    img = _page()
    quad = Quadrilateral(np.array([[10, 10], [10, 10],
                                   [10, 10], [10, 10]]), '', 0.9)
    w, H = warp.crop_plan_quad(quad, 'h', TH)
    dev = np.asarray(warp.crop_batch(
        jnp.asarray(img), jnp.asarray(H[None]),
        jnp.asarray([w], np.int32), out_h=TH, out_w=w))[0]
    assert np.allclose(dev, -1.0)


def test_model48_wrapper_device_crop_path(monkeypatch):
    """The opt-in MIT_TPU_DEVICE_CROPS=1 path produces the same texts as
    the default host-crop path through the real wrapper."""
    import asyncio
    import logging
    from manga_image_translator_tpu.config import OcrConfig
    from manga_image_translator_tpu.models import ocr48
    from manga_image_translator_tpu.ocr import model_48px as mod

    m = mod.Model48pxOCR.__new__(mod.Model48pxOCR)
    m.params = ocr48.fuse_qkv_params(ocr48.init_params(dict_size=64))
    m.dictionary = mod._placeholder_dictionary()[:64]
    m.logger = logging.getLogger('test')

    img = _page(256, 384, seed=2)
    monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 8)
    monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 8)

    def run():
        quads = [Quadrilateral(np.array([[40, 60], [300, 60],
                                         [300, 104], [40, 104]]), '', 0.9),
                 Quadrilateral(np.array([[50, 150], [260, 150],
                                         [260, 190], [50, 190]]), '', 0.9)]
        return asyncio.run(m._infer(img, quads, OcrConfig(), False))

    monkeypatch.setenv('MIT_TPU_DEVICE_CROPS', '0')
    host_out = run()
    monkeypatch.setenv('MIT_TPU_DEVICE_CROPS', '1')
    dev_out = run()
    # same number of surviving regions; texts may differ only on
    # interpolation-boundary near-ties with random weights, but the path
    # must run end-to-end and return the same type of results
    assert len(dev_out) == len(host_out)
    for r in dev_out:
        assert isinstance(r.text, str)


class TestSeparableResampler:
    """crop_batch_separable (matmul resampling, zero gathers) must match
    the gather path exactly for axis-aligned quads."""

    def _plan(self, quad, direction='h'):
        w, H = warp.crop_plan_quad(quad, direction, TH)
        return w, H

    def test_matches_gather_path_axis_aligned(self):
        img = _page()
        quads = [
            Quadrilateral(np.array([[50, 100], [350, 100],
                                    [350, 160], [50, 160]]), '', 0.9),
            Quadrilateral(np.array([[10, 20], [210, 20],
                                    [210, 60], [10, 60]]), '', 0.9),
        ]
        ws, Hs = zip(*(self._plan(q) for q in quads))
        bw = max(ws)
        valid = np.asarray([min(w, bw) for w in ws], np.int32)
        Hs = np.stack(Hs)
        ref = np.asarray(warp.crop_batch(
            jnp.asarray(img), jnp.asarray(Hs), jnp.asarray(valid),
            out_h=TH, out_w=bw))
        got = np.asarray(warp.crop_batch_auto(
            jnp.asarray(img), Hs, valid, out_h=TH, out_w=bw))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_auto_routes_rotated_to_gather(self):
        img = _page()
        rot = Quadrilateral(np.array([[100, 100], [300, 140],
                                      [290, 190], [90, 150]]), '', 0.9)
        w, H = self._plan(rot)
        assert warp.separable_plan(H, TH, w, warp.SEP_SRC_H, 2 * w) is None
        # crop_batch_auto still returns a crop (gather fallback)
        out = np.asarray(warp.crop_batch_auto(
            jnp.asarray(img), H[None], np.asarray([w], np.int32),
            out_h=TH, out_w=w))
        assert out.shape == (1, TH, w, 3)

    def test_partially_outside_page_zero_pads(self):
        img = _page()
        quad = Quadrilateral(np.array([[-40, -20], [260, -20],
                                       [260, 40], [-40, 40]]), '', 0.9)
        w, H = self._plan(quad)
        plan = warp.separable_plan(H, TH, w, warp.SEP_SRC_H, 2 * w)
        assert plan is not None
        ref = np.asarray(warp.crop_batch(
            jnp.asarray(img), jnp.asarray(H[None]),
            jnp.asarray([w], np.int32), out_h=TH, out_w=w))
        got = np.asarray(warp.crop_batch_auto(
            jnp.asarray(img), H[None], np.asarray([w], np.int32),
            out_h=TH, out_w=w))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_too_tall_source_falls_back(self):
        # a source quad taller than SEP_SRC_H must be rejected by the plan
        quad = Quadrilateral(np.array([[0, 0], [400, 0],
                                       [400, 200], [0, 200]]), '', 0.9)
        w, H = self._plan(quad)
        assert warp.separable_plan(H, TH, w, warp.SEP_SRC_H, 2 * w) is None


class TestMixedChunkRouting:
    """crop_chunk_mixed: separable quads on device, rotated quads host-
    warped and patched over their rows — the 'auto' default for chunks
    that mix both."""

    def _quads(self):
        axis1 = Quadrilateral(np.array([[50, 100], [350, 100],
                                        [350, 160], [50, 160]]), '', 0.9)
        c, s = np.cos(0.25), np.sin(0.25)
        R = np.array([[c, -s], [s, c]])
        base = np.array([[-120, -25], [120, -25], [120, 25], [-120, 25]])
        rot = Quadrilateral((base @ R.T + np.array([300, 250])), '', 0.9)
        axis2 = Quadrilateral(np.array([[10, 20], [210, 20],
                                        [210, 60], [10, 60]]), '', 0.9)
        return [axis1, rot, axis2]

    def test_mixed_chunk_matches_componentwise(self):
        img = _page(500, 600)
        quads = self._quads()
        plans = [warp.crop_plan_quad(q, 'h', TH) for q in quads]
        ws = [p[0] for p in plans]
        assert warp.separable_plan(plans[1][1], TH, ws[1],
                                   warp.SEP_SRC_H, 2 * ws[1]) is None
        host_regions = {1: quads[1].get_transformed_region(img, 'h', TH)}
        chunk_size = 4
        bw = max(ws)
        valid = np.zeros((chunk_size,), np.int32)
        valid[:3] = [min(w, bw) for w in ws]
        got = np.asarray(warp.crop_chunk_mixed(
            jnp.asarray(img), plans, [0, 1, 2], host_regions, valid,
            TH, bw, chunk_size))
        assert got.shape == (chunk_size, TH, bw, 3)
        # separable rows match the pure-separable path
        sep_ref = np.asarray(warp.crop_batch_auto(
            jnp.asarray(img), np.stack([plans[0][1], plans[2][1]]),
            valid[[0, 2]], out_h=TH, out_w=bw))
        np.testing.assert_allclose(got[0], sep_ref[0], atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(got[2], sep_ref[1], atol=2e-5, rtol=1e-5)
        # the patched row reproduces the host crop exactly
        reg = host_regions[1]
        buf = np.zeros((TH, bw, 3), np.float32)
        buf[:, :min(reg.shape[1], bw)] = reg[:, :bw]
        np.testing.assert_allclose(got[1], buf / 127.5 - 1.0,
                                   atol=1e-6, rtol=0)
        # padding row is all -1
        assert np.allclose(got[3], -1.0)

    def test_all_separable_chunk_has_no_patches(self):
        img = _page(500, 600)
        quads = [self._quads()[0], self._quads()[2]]
        plans = [warp.crop_plan_quad(q, 'h', TH) for q in quads]
        ws = [p[0] for p in plans]
        bw = max(ws)
        valid = np.asarray([min(w, bw) for w in ws], np.int32)
        got = np.asarray(warp.crop_chunk_mixed(
            jnp.asarray(img), plans, [0, 1], {}, valid, TH, bw, 2))
        ref = np.asarray(warp.crop_batch_auto(
            jnp.asarray(img), np.stack([p[1] for p in plans]), valid,
            out_h=TH, out_w=bw))
        np.testing.assert_allclose(got, ref, atol=0, rtol=0)

    def test_model48_auto_mixed_end_to_end(self, monkeypatch):
        """The 'auto' wrapper path runs end-to-end on a chunk mixing
        axis-aligned and rotated quads."""
        import asyncio
        import logging
        from manga_image_translator_tpu.config import OcrConfig
        from manga_image_translator_tpu.models import ocr48
        from manga_image_translator_tpu.ocr import model_48px as mod

        m = mod.Model48pxOCR.__new__(mod.Model48pxOCR)
        m.params = ocr48.fuse_qkv_params(ocr48.init_params(dict_size=64))
        m.dictionary = mod._placeholder_dictionary()[:64]
        m.logger = logging.getLogger('test')
        img = _page(500, 600, seed=3)
        monkeypatch.setattr(mod, 'MAX_SEQ_LEN', 8)
        monkeypatch.setattr(mod, 'FAST_SEQ_LEN', 8)
        monkeypatch.setenv('MIT_TPU_DEVICE_CROPS', 'auto')
        out = asyncio.run(m._infer(img, self._quads(), OcrConfig(), False))
        assert all(isinstance(r.text, str) for r in out)
