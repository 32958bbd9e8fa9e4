"""Pallas bilateral kernel: interpret-mode parity vs cv2 and the XLA
formulation."""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from manga_image_translator_tpu.ops.bilateral import bilateral_filter
from manga_image_translator_tpu.ops.pallas_bilateral import (
    bilateral_filter_pallas,
)


def test_matches_cv2_interior():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (96, 130, 3), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(bilateral_filter_pallas(jnp.asarray(img),
                                                  9, 40.0, 40.0))
    ref = cv2.bilateralFilter(img, 9, 40, 40)
    diff = np.abs(ours[5:-5, 5:-5].astype(int) - ref[5:-5, 5:-5].astype(int))
    assert diff.max() <= 1


def test_matches_xla_formulation():
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (80, 90, 3), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(bilateral_filter_pallas(jnp.asarray(img),
                                                  7, 30.0, 30.0))
    ref = np.asarray(bilateral_filter(jnp.asarray(img), 7, 30.0, 30.0))
    diff = np.abs(ours[4:-4, 4:-4].astype(int) - ref[4:-4, 4:-4].astype(int))
    assert diff.max() <= 1


@pytest.mark.parametrize('variant', ['v2', 'v3', 'v4', 'v5', 'v5w'])
def test_hoisted_kernel_matches_v1(variant):
    """The hoisted-roll kernels (v2 bf16 scratch / v3 f32 scratch), the
    circular-tap-skip kernel (v4) and the full-halo channelwise kernel (v5)
    are bit-identical to the v1 per-tap-roll kernel on uint8 input (pixel
    integers 0..255 are exact in bf16; all arithmetic stays f32; skipped
    taps contribute exactly zero; v5's halo ring garbage is sliced away)."""
    rs = np.random.RandomState(2)
    img = rs.randint(0, 255, (72, 100, 3), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 9, 40.0, 40.0, variant='v1'))
        new = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 9, 40.0, 40.0, variant=variant))
    np.testing.assert_array_equal(base, new)


def test_fast_exp_poly_matches_exact(monkeypatch):
    """MIT_TPU_BILATERAL_EXP=poly (bit-assembled 2^n * poly(f) exp
    approximation, rel err ~3e-6) must round to the same uint8 output as
    the hardware exp — at most 1 gray level anywhere."""
    rs = np.random.RandomState(2)
    img = rs.randint(0, 255, (96, 130, 3), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        exact = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 9, 40.0, 40.0, variant='v5'))
        monkeypatch.setenv('MIT_TPU_BILATERAL_EXP', 'poly')
        bilateral_filter_pallas._clear_cache()
        try:
            poly = np.asarray(bilateral_filter_pallas(
                jnp.asarray(img), 9, 40.0, 40.0, variant='v5'))
        finally:
            monkeypatch.delenv('MIT_TPU_BILATERAL_EXP')
            bilateral_filter_pallas._clear_cache()
    diff = np.abs(poly.astype(int) - exact.astype(int))
    assert diff.max() <= 1
    # and overwhelmingly byte-identical
    assert (diff != 0).mean() < 1e-3


def test_paired_kernel_matches_v1_within_rounding():
    """v6 (symmetric-pair weight sharing) computes the same weighted sums
    with a different f32 association order — after uint8 rounding it may
    differ from v1 by at most 1 gray level, and must match cv2 as closely
    as v1 does."""
    rs = np.random.RandomState(4)
    img = rs.randint(0, 255, (72, 100, 3), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 9, 40.0, 40.0, variant='v1'))
        new = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 9, 40.0, 40.0, variant='v6'))
    assert np.abs(base.astype(int) - new.astype(int)).max() <= 1
    ref = cv2.bilateralFilter(img, 9, 40, 40)
    diff = np.abs(new[5:-5, 5:-5].astype(int) - ref[5:-5, 5:-5].astype(int))
    assert diff.max() <= 1


def test_paired_kernel_even_radius_production_shape():
    """v6 at the production d=17 window (radius 8) on a non-128-multiple
    width, vs v1."""
    rs = np.random.RandomState(5)
    img = rs.randint(0, 255, (70, 150, 3), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 17, 80.0, 80.0, variant='v1'))
        new = np.asarray(bilateral_filter_pallas(
            jnp.asarray(img), 17, 80.0, 80.0, variant='v6'))
    assert np.abs(base.astype(int) - new.astype(int)).max() <= 1
