"""Detection stage tests: DB postprocess geometry + end-to-end detector run
with random weights (shape/pipeline sanity; weight parity is covered by
test_torch_parity)."""
import asyncio

import cv2
import numpy as np
import pytest

from manga_image_translator_tpu.detection.db_postprocess import DBPostprocess


def make_prob_map(boxes, shape=(256, 256)):
    prob = np.zeros(shape, np.float32)
    for (x, y, w, h) in boxes:
        prob[y:y + h, x:x + w] = 0.9
    return prob


class TestDBPostprocess:
    def test_single_box_detected(self):
        prob = make_prob_map([(50, 60, 80, 20)])
        det = DBPostprocess(thresh=0.5, box_thresh=0.7, unclip_ratio=2.0)
        boxes, scores = det(prob, 256, 256)
        assert boxes.shape[0] == 1
        assert scores[0] > 0.85
        x1, y1 = boxes[0].min(axis=0)
        x2, y2 = boxes[0].max(axis=0)
        # unclipped box must contain the source region
        assert x1 <= 50 and y1 <= 60 and x2 >= 130 and y2 >= 80
        # unclip distance = area*ratio/perimeter = (80*20*2)/(2*100) = 16
        assert x1 == pytest.approx(50 - 16, abs=2)
        assert y1 == pytest.approx(60 - 16, abs=2)

    def test_multiple_boxes(self):
        prob = make_prob_map([(10, 10, 60, 16), (10, 120, 100, 16),
                              (150, 40, 16, 100)])
        det = DBPostprocess(thresh=0.5, box_thresh=0.7, unclip_ratio=1.5)
        boxes, scores = det(prob, 256, 256)
        assert boxes.shape[0] == 3

    def test_low_score_region_filtered(self):
        prob = np.zeros((128, 128), np.float32)
        prob[20:40, 20:90] = 0.55  # above binarize thresh, below box thresh
        det = DBPostprocess(thresh=0.5, box_thresh=0.7)
        boxes, _ = det(prob, 128, 128)
        assert boxes.shape[0] == 0

    def test_tiny_region_filtered(self):
        prob = make_prob_map([(10, 10, 2, 2)])
        det = DBPostprocess(thresh=0.5, box_thresh=0.5)
        boxes, _ = det(prob, 256, 256)
        assert boxes.shape[0] == 0

    def test_rotated_box(self):
        prob = np.zeros((200, 200), np.float32)
        rect = ((100, 100), (120, 24), 30.0)
        pts = cv2.boxPoints(rect).astype(np.int32)
        cv2.fillPoly(prob, [pts], 0.9)
        det = DBPostprocess(thresh=0.5, box_thresh=0.7, unclip_ratio=1.5)
        boxes, scores = det(prob, 200, 200)
        assert boxes.shape[0] == 1
        got = cv2.minAreaRect(boxes[0].astype(np.int32).reshape(-1, 1, 2))
        angle = got[2] % 90
        assert min(abs(angle - 30), abs(angle - 60)) < 6

    def test_dest_scaling(self):
        prob = make_prob_map([(50, 60, 80, 20)], (256, 256))
        det = DBPostprocess(thresh=0.5, box_thresh=0.7, unclip_ratio=1.0)
        boxes_1x, _ = det(prob, 256, 256)
        boxes_2x, _ = det(prob, 512, 512)
        np.testing.assert_allclose(boxes_2x[0], boxes_1x[0] * 2, atol=2)


class TestDefaultDetectorPipeline:
    def test_detect_runs_and_returns_mask(self):
        from manga_image_translator_tpu.detection import (
            Detector, dispatch)

        img = np.full((300, 400, 3), 255, np.uint8)
        cv2.putText(img, 'TEST', (50, 150), cv2.FONT_HERSHEY_SIMPLEX, 2,
                    (0, 0, 0), 4)
        textlines, raw_mask, mask = asyncio.run(dispatch(
            Detector.default, img, detect_size=256, text_threshold=0.5,
            box_threshold=0.7, unclip_ratio=2.3, invert=False,
            gamma_correct=False, rotate=False, device='cpu'))
        assert isinstance(textlines, list)
        assert raw_mask.dtype == np.uint8
        # mask is restored to the network-input resolution (pads removed)
        assert raw_mask.shape[0] > 0 and raw_mask.shape[1] > 0
