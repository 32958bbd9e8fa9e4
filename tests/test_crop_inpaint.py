"""Masked-crop inpainting: planner geometry + executor compositing.

The redesign (inpainting/crop_plan.py): the final composite discards every
pixel outside the mask (reference inpainting_lama_mpe.py:117), so the
generator only needs to see context-padded crops around the mask CCs.
These tests pin the planner invariants and prove the executor writes back
exactly the mask pixels — everything outside stays byte-identical.
"""
import asyncio

import numpy as np
import pytest

from manga_image_translator_tpu.config import InpainterConfig
from manga_image_translator_tpu.inpainting.common import OfflineInpainter
from manga_image_translator_tpu.inpainting.crop_plan import (
    Crop, DEFAULT_BUCKETS, full_page_path_pixels, pad_batch_size, plan_crops)

pytestmark = pytest.mark.quick


def _mask(h=1536, w=1536):
    return np.zeros((h, w), np.uint8)


def _ownership_map(crops, mask_bin, owner):
    """Count, per mask pixel, how many crops own it (must be exactly 1)."""
    own = np.zeros(mask_bin.shape, np.int32)
    for c in crops:
        sel = np.zeros(mask_bin.shape, bool)
        sel[c.gy0:c.gy1, c.gx0:c.gx1] = True
        sel &= mask_bin
        if owner is not None and c.labels:
            sel &= np.isin(owner, np.asarray(c.labels, np.int32))
        own += sel
        # the crop window must cover everything it owns
        ys, xs = np.nonzero(sel)
        if ys.size:
            assert c.x0 <= xs.min() and c.x0 + c.w > xs.max()
            assert c.y0 <= ys.min() and c.y0 + c.h > ys.max()
    return own


class TestPlanCrops:
    def test_empty_mask(self):
        crops, wg, owner = plan_crops(_mask())
        assert crops == []
        assert wg.shape == (1536, 1536) and not wg.any()
        assert owner is None

    def test_single_cc_snaps_to_bucket(self):
        m = _mask()
        m[700:740, 600:880] = 255  # 280x40 textline
        crops, mask_bin, _ = plan_crops(m)
        assert len(crops) == 1
        c = crops[0]
        assert (c.bh, c.bw) in {(bh, bw) for bh in DEFAULT_BUCKETS
                                for bw in DEFAULT_BUCKETS}
        assert not c.scaled
        # crop covers the padded CC box (min_pad=32 of context)
        assert c.x0 <= 600 - 32 and c.x0 + c.w >= 880 + 32
        assert c.y0 <= 700 - 32 and c.y0 + c.h >= 740 + 32
        # cell rect owns the whole CC and sits inside the crop rect
        assert c.gx0 <= 600 and c.gx1 >= 880
        assert c.gy0 <= 700 and c.gy1 >= 740
        assert c.x0 <= c.gx0 and c.x0 + c.w >= c.gx1
        assert c.y0 <= c.gy0 and c.y0 + c.h >= c.gy1
        assert mask_bin.sum() == 280 * 40

    def test_nearby_ccs_merge_far_ccs_split(self):
        m = _mask()
        m[100:140, 100:380] = 255    # line A
        m[160:200, 100:380] = 255    # line B, 20px below A -> same balloon
        m[1200:1240, 1100:1380] = 255  # far-away line C
        crops, mask_bin, owner = plan_crops(m)
        assert len(crops) == 2
        own = _ownership_map(crops, mask_bin, owner)
        assert (own[mask_bin] == 1).all()
        # A and B share a crop; C has its own
        ab = [i for i, c in enumerate(crops)
              if c.x0 <= 100 and c.y0 <= 100]
        assert len(ab) == 1 and len(crops[ab[0]].labels) == 2

    def test_oversize_group_tiles_full_res(self):
        m = _mask()
        m[100:200, 50:1450] = 255  # wider than the largest bucket
        crops, mb, owner = plan_crops(m)
        # tiled into several FULL-RESOLUTION crops (no downscaling)
        assert len(crops) >= 2
        assert not any(c.scaled for c in crops)
        own = _ownership_map(crops, mb, owner)
        assert (own[mb] == 1).all()
        assert own.max() <= 1

    def test_big_square_group_avoids_1024_square_bucket(self):
        # 900x900 balloon cluster: the (1024, 1024) bucket is pathologically
        # slow at batch 1 on v5e — the planner must tile the longer dim
        m = _mask()
        for y in range(320, 1180, 120):
            m[y:y + 60, 320:1180] = 255
        plan = plan_crops(m)
        assert plan is not None
        crops, mb, owner = plan
        assert all((c.bh, c.bw) != (1024, 1024) for c in crops)
        own = _ownership_map(crops, mb, owner)
        assert own.max() <= 1 and (own[mb] == 1).all()

    def test_scattered_lines_stay_separate_crops(self):
        # pixel-saving merge: far-apart lines must NOT transitively merge
        # into a page-wide group
        m = _mask()
        spots = [(100, 100), (100, 1100), (1300, 100), (1300, 1100),
                 (700, 600)]
        for (y, x) in spots:
            m[y:y + 40, x:x + 280] = 255
        crops, mb, owner = plan_crops(m)
        assert len(crops) == len(spots)
        own = _ownership_map(crops, mb, owner)
        assert (own[mb] == 1).all()
        # each crop stays line-sized (bucket <= 512x192), not page-sized
        for c in crops:
            assert c.bw <= 512 and c.bh <= 192

    def test_full_mask_falls_back(self):
        m = np.full((1536, 1536), 255, np.uint8)
        fp = full_page_path_pixels(1536, 1536, 1024)
        assert plan_crops(m, full_page_pixels=fp) is None

    def test_narrow_image_clamps_bucket(self):
        # 400px-wide webtoon strip: the x bucket clamps to the image width
        m = _mask(1536, 400)
        m[100:140, 50:350] = 255
        plan = plan_crops(m)
        assert plan is not None
        crops, _, _ = plan
        c = crops[0]
        assert c.bw <= 400 and c.bw % 8 == 0
        assert c.x0 >= 0 and c.x0 + c.w <= 400

    def test_tiny_image_small_mask_plans_small_crop(self):
        # small buckets (128/192) make a sub-page crop worthwhile even on a
        # tiny page
        m = _mask(200, 200)
        m[80:120, 40:160] = 255
        plan = plan_crops(m)
        assert plan is not None
        crops, _, _ = plan
        assert len(crops) == 1 and crops[0].bw * crops[0].bh < 200 * 200

    def test_tiny_image_large_mask_falls_back(self):
        # the clamped crop covers the whole page -> full-page path wins
        m = _mask(200, 200)
        m[10:190, 10:190] = 255
        assert plan_crops(m) is None

    def test_coverage_accounts_for_inpainting_size_resize(self):
        # a mask that would plan ~full-page crops must fall back when the
        # full-page path (resized to inpainting_size) is cheaper
        m = _mask()
        step = 160
        for y in range(40, 1500, step):
            for x in range(40, 1500, step):
                m[y:y + 80, x:x + 80] = 255
        fp = full_page_path_pixels(1536, 1536, 1024)
        assert fp == 1024 * 1024
        assert plan_crops(m, full_page_pixels=fp) is None

    def test_scale_shrinks_device_pixels(self):
        # reference-equivalent scale (inpainting_size/page): buckets snap
        # to the scaled spans, device pixels drop ~scale^2, ownership
        # invariants hold unchanged
        m = _mask()
        rs = np.random.RandomState(7)
        for _ in range(25):
            x, y = rs.randint(0, 1536 - 300), rs.randint(0, 1536 - 60)
            m[y:y + 40, x:x + 280] = 255
        native = plan_crops(m, scale=1.0)
        scaled = plan_crops(m, scale=2 / 3)
        assert native is not None and scaled is not None
        px_n = sum(c.bw * c.bh for c in native[0])
        px_s = sum(c.bw * c.bh for c in scaled[0])
        assert px_s < 0.62 * px_n
        crops, mb, owner = scaled
        assert all(c.scaled for c in crops)
        own = _ownership_map(crops, mb, owner)
        assert (own[mb] == 1).all() and own[~mb].sum() == 0

    def test_pad_batch_size(self):
        assert pad_batch_size(1) == 1
        assert pad_batch_size(3) == 4
        assert pad_batch_size(9) == 16
        assert pad_batch_size(33) == 64


class _FakeInpainter(OfflineInpainter):
    """Batchable inpainter stub: fills masked pixels with 7, leaves the rest
    (so crop compositing bugs show up as wrong bytes)."""
    _MODEL_MAPPING = {}

    def __init__(self):
        super().__init__()
        self.batch_shapes = []

    async def _load(self, device):
        pass

    async def _unload(self):
        pass

    async def _infer(self, image, mask, config, inpainting_size=1024,
                     verbose=False):
        out = np.copy(image)
        out[mask >= 127] = 9  # distinct from the crop path's 7
        return out

    def _batch_forward(self, imgs, masks, config):
        self.batch_shapes.append(imgs.shape)
        out = np.copy(imgs)
        out[masks >= 127] = 7
        return out


class TestCropExecutor:
    def _page(self, seed=0, h=1536, w=1536):
        rs = np.random.RandomState(seed)
        return rs.randint(0, 255, (h, w, 3), np.uint8)

    def test_outside_mask_is_byte_identical(self):
        img = self._page()
        m = _mask()
        m[700:740, 600:880] = 255
        m[1200:1240, 100:380] = 255
        inp = _FakeInpainter()
        out = asyncio.run(inp.inpaint(img, m, InpainterConfig(), 1024))
        sel = m >= 127
        # crops render at the inpainting_size scale (2/3 here), so the
        # resize roundtrip blends the 1px mask boundary ring — exactly like
        # the reference full-page path's downscale. The eroded interior is
        # pure fill; outside the mask stays byte-identical.
        import cv2
        interior = cv2.erode(m, np.ones((5, 5), np.uint8)) >= 127
        assert (out[interior] == 7).all()               # crop path ran
        np.testing.assert_array_equal(out[~sel], img[~sel])
        # batches padded to a static size
        for shape in inp.batch_shapes:
            assert shape[0] in (1, 2, 4, 8, 16, 32)
            assert shape[1] in DEFAULT_BUCKETS and shape[2] in DEFAULT_BUCKETS

    def test_full_mask_uses_fallback_path(self):
        img = self._page()
        m = np.full((1536, 1536), 255, np.uint8)
        inp = _FakeInpainter()
        out = asyncio.run(inp.inpaint(img, m, InpainterConfig(), 1024))
        assert (out == 9).all()          # _infer (full-page) path
        assert inp.batch_shapes == []

    def test_native_scale_env_keeps_exact_fill(self, monkeypatch):
        # MIT_TPU_INPAINT_CROP_NATIVE=1: crops run at page resolution — no
        # resize roundtrip, every mask pixel is exactly the fill value
        monkeypatch.setenv('MIT_TPU_INPAINT_CROP_NATIVE', '1')
        img = self._page()
        m = _mask()
        m[700:740, 600:880] = 255
        inp = _FakeInpainter()
        out = asyncio.run(inp.inpaint(img, m, InpainterConfig(), 1024))
        sel = m >= 127
        assert (out[sel] == 7).all()
        np.testing.assert_array_equal(out[~sel], img[~sel])

    def test_disabled_flag_reverts(self, monkeypatch):
        monkeypatch.setenv('MIT_TPU_INPAINT_CROPS', '0')
        img = self._page()
        m = _mask()
        m[700:740, 600:880] = 255
        inp = _FakeInpainter()
        out = asyncio.run(inp.inpaint(img, m, InpainterConfig(), 1024))
        assert (out[m >= 127] == 9).all()

    def test_batch_pools_crops_across_pages(self):
        pages = [self._page(i) for i in range(3)]
        masks = []
        for i in range(3):
            m = _mask()
            m[700:740, 600:880] = 255
            masks.append(m)
        inp = _FakeInpainter()
        outs = asyncio.run(inp.infer_batch(pages, masks, InpainterConfig(),
                                           1024))
        # one bucket, one device call for all 3 pages' crops (padded to 4)
        assert len(inp.batch_shapes) == 1
        assert inp.batch_shapes[0][0] == 4
        import cv2
        for img, m, out in zip(pages, masks, outs):
            sel = m >= 127
            interior = cv2.erode(m, np.ones((5, 5), np.uint8)) >= 127
            assert (out[interior] == 7).all()
            np.testing.assert_array_equal(out[~sel], img[~sel])

    def test_batch_mixed_fallback(self):
        pages = [self._page(0), self._page(1)]
        m0 = _mask()
        m0[700:740, 600:880] = 255
        m1 = np.full((1536, 1536), 255, np.uint8)
        inp = _FakeInpainter()
        outs = asyncio.run(inp.infer_batch(pages, [m0, m1],
                                           InpainterConfig(), 1024))
        import cv2
        interior0 = cv2.erode(m0, np.ones((5, 5), np.uint8)) >= 127
        assert (outs[0][interior0] == 7).all()
        assert (outs[1] == 7).all()      # letterbox batch also _batch_forward
        # letterbox path resizes the full page to inpainting_size
        assert any(s[1] > max(DEFAULT_BUCKETS) or s[1] == 1024
                   for s in inp.batch_shapes)

    def test_oversize_group_roundtrip(self):
        img = self._page()
        m = _mask()
        m[100:200, 50:1450] = 255  # forces scaled crop
        inp = _FakeInpainter()
        out = asyncio.run(inp.inpaint(img, m, InpainterConfig(), 2048))
        sel = m >= 127
        # resize roundtrip blends the crop's mask boundary: assert the
        # eroded interior is filled and the outside is untouched
        import cv2
        interior = cv2.erode(m, np.ones((9, 9), np.uint8)) >= 127
        assert (out[interior] == 7).all()
        np.testing.assert_array_equal(out[~sel], img[~sel])


class TestInsideMaskQuality:
    """Inside-mask fill quality of the crop path vs the full-page path with
    seeded LaMa weights (regression for the tolerance measured by
    devscripts/studies/crop_inpaint_quality_ab.py): the crop fill must stay
    at least as close to the full-page fill as the full-page fill is to
    ITSELF under the reference's own accepted scale change
    (inpainting_size resize, reference inpainting_lama_mpe.py:56-118)."""

    @staticmethod
    def _psnr_inside(a, b, mask_bin):
        d = (a.astype(np.float64) - b.astype(np.float64))[mask_bin]
        mse = float((d ** 2).mean())
        return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    def test_crop_fill_within_scale_sensitivity_band(self, monkeypatch):
        import cv2
        from manga_image_translator_tpu.inpainting.inpainting_lama import (
            LamaMPEInpainter)

        monkeypatch.setenv('MIT_TPU_ALLOW_RANDOM_WEIGHTS', '1')
        monkeypatch.setenv('MIT_TPU_MESH', '0')

        rs = np.random.RandomState(5)
        page = 384
        y, x = np.mgrid[0:page, 0:page].astype(np.float32) / page
        img = np.stack([120 + 80 * x, 100 + 60 * y, 140 + 50 * (x + y) / 2],
                       axis=-1)
        blobs = np.zeros((page, page, 3), np.float32)
        for _ in range(6):
            cv2.circle(blobs, tuple(rs.randint(0, page, 2)),
                       rs.randint(20, 80), rs.randint(0, 255, 3).tolist(),
                       -1)
        img = np.clip(0.6 * img + 0.4 * cv2.GaussianBlur(blobs, (31, 31), 0),
                      0, 255).astype(np.uint8)
        mask = np.zeros((page, page), np.uint8)
        for _ in range(4):
            mx, my = rs.randint(0, page - 90), rs.randint(0, page - 24)
            mask[my:my + 14, mx:mx + 80] = 255
        mask_bin = mask >= 127

        inp = LamaMPEInpainter()
        asyncio.run(inp.load('cpu'))
        cfg = InpainterConfig()
        full = asyncio.run(inp._infer(img, mask, cfg, 320))
        full_small = asyncio.run(inp._infer(img, mask, cfg, 256))
        crop = inp._inpaint_crops_multi([img], [mask], cfg, 320)[0]
        assert crop is not None, 'plan unexpectedly fell back'
        np.testing.assert_array_equal(crop[~mask_bin], img[~mask_bin])

        band = self._psnr_inside(full, full_small, mask_bin)
        got = self._psnr_inside(full, crop, mask_bin)
        # 1 dB slack below the model's own scale-sensitivity band
        assert got >= band - 1.0, (got, band)
