import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manga_image_translator_tpu import ops


class TestMorphology:
    @pytest.mark.parametrize('k', [3, 5, 7, 9, 15])
    def test_ellipse_kernel_matches_cv2(self, k):
        ours = ops.ellipse_kernel(k)
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        np.testing.assert_array_equal(ours.astype(np.uint8), ref)

    @pytest.mark.parametrize('k', [3, 7, 11])
    def test_dilate_matches_cv2(self, k):
        rng = np.random.RandomState(0)
        mask = (rng.rand(64, 80) > 0.9).astype(np.float32)
        ours = np.asarray(ops.dilate(jnp.asarray(mask), k))
        se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        ref = cv2.dilate(mask.astype(np.uint8), se)
        np.testing.assert_array_equal(ours.astype(np.uint8), ref)

    def test_erode_inverse_of_dilate_on_solid(self):
        mask = np.zeros((32, 32), np.float32)
        mask[8:24, 8:24] = 1
        er = np.asarray(ops.erode(jnp.asarray(mask), 3))
        se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        ref = cv2.erode(mask.astype(np.uint8), se)
        np.testing.assert_array_equal(er.astype(np.uint8), ref)

    def test_gaussian_blur_preserves_mean(self):
        img = np.random.RandomState(1).rand(40, 40).astype(np.float32)
        out = np.asarray(ops.gaussian_blur(jnp.asarray(img), 2.0))
        assert abs(out.mean() - img.mean()) < 0.02


class TestTiling:
    def test_no_tiling_for_normal_page(self):
        assert not ops.needs_tiling(1500, 1000, 1024)

    def test_tiling_for_webtoon(self):
        assert ops.needs_tiling(12000, 800, 1024)

    def test_roundtrip_stitch(self):
        h, w = 9000, 700
        img = np.random.RandomState(0).rand(h, w, 1).astype(np.float32)
        plan = ops.plan_tiles(h, w, 1024)
        squares = ops.extract_squares(jnp.asarray(img), plan)
        assert squares.shape[1] == squares.shape[2] == plan.patch_h
        stitched = np.asarray(ops.stitch_maps(squares, plan))
        assert stitched.shape == (h, w, 1)
        np.testing.assert_allclose(stitched, img, atol=1e-5)

    def test_roundtrip_transpose(self):
        h, w = 700, 9000
        img = np.random.RandomState(0).rand(h, w, 1).astype(np.float32)
        plan = ops.plan_tiles(h, w, 1024)
        squares = ops.extract_squares(jnp.asarray(img), plan)
        stitched = np.asarray(ops.stitch_maps(squares, plan))
        assert stitched.shape == (h, w, 1)
        np.testing.assert_allclose(stitched, img, atol=1e-5)


class TestWarp:
    def test_identity_homography(self):
        img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
        H = np.eye(3)
        out = np.asarray(ops.warp_perspective(jnp.asarray(img), jnp.asarray(H),
                                              (32, 32)))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_matches_cv2_warp(self):
        rng = np.random.RandomState(2)
        img = rng.rand(100, 120, 3).astype(np.float32)
        quad = np.array([[20, 10], [90, 15], [88, 45], [18, 40]],
                        dtype=np.float32)
        w, h = 64, 32
        Hinv = ops.homography_from_quad(quad, w, h)
        ours = np.asarray(ops.warp_perspective(
            jnp.asarray(img), jnp.asarray(Hinv), (h, w)))
        dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                       dtype=np.float32)
        M = cv2.getPerspectiveTransform(quad, dst)
        ref = cv2.warpPerspective(img, M, (w, h))
        # interiors match; borders differ by padding policy
        np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-2)

    def test_batched_crops(self):
        img = np.random.RandomState(3).rand(100, 100, 3).astype(np.float32)
        quads = [np.array([[10, 10], [50, 10], [50, 30], [10, 30]]),
                 np.array([[20, 40], [80, 40], [80, 60], [20, 60]])]
        Hs = np.stack([ops.homography_from_quad(q, 48, 24) for q in quads])
        out = ops.warp_quads_batch(jnp.asarray(img), jnp.asarray(Hs), (24, 48))
        assert out.shape == (2, 24, 48, 3)


class TestCRF:
    def test_crf_sharpens_mask_to_edges(self):
        # white bg, black square of "text"; raw mask is a blurry blob
        rgb = np.full((48, 48, 3), 255, np.uint8)
        rgb[16:32, 16:32] = 0
        raw = np.zeros((48, 48), np.float32)
        raw[12:36, 12:36] = 0.6  # overwide low-confidence mask
        out = np.asarray(ops.crf_refine(jnp.asarray(rgb), jnp.asarray(raw),
                                        radius=15, stride=2))
        # refined mask should be high inside the dark square,
        # low in the white border band it used to cover
        assert out[24, 24] > 0.5
        assert out[13, 13] < 0.5

    def test_crf_batch_shape(self):
        rgb = np.random.randint(0, 255, (2, 32, 32, 3), dtype=np.uint8)
        raw = np.random.RandomState(0).rand(2, 32, 32).astype(np.float32)
        out = ops.crf_refine_batch(jnp.asarray(rgb), jnp.asarray(raw),
                                   radius=7, stride=2)
        assert out.shape == (2, 32, 32)


class TestImage:
    def test_letterbox(self):
        img = jnp.zeros((100, 50, 3))
        out, ratio, (nh, nw) = ops.letterbox(img, 64)
        assert out.shape == (64, 64, 3)
        assert nh == 64 and nw == 32
        assert ratio == pytest.approx(0.64)

    def test_pad_to_multiple(self):
        img = jnp.zeros((100, 50, 3))
        out, (ph, pw) = ops.pad_to_multiple(img, 8)
        assert out.shape == (104, 56, 3)

    def test_rgb_to_gray_matches_cv2(self):
        img = np.random.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        ours = np.asarray(ops.rgb_to_gray(jnp.asarray(img)))
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
        np.testing.assert_allclose(ours, ref, atol=1.0)

    def test_canonical_size(self):
        assert ops.pick_canonical_size(800, 600) == 1024
        assert ops.pick_canonical_size(1300, 700) == 1536
        assert ops.pick_canonical_size(4000, 700) == 2048
