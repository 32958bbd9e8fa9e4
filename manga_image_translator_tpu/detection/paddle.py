"""Paddle detector backend on TPU.

Contract: reference ``detection/common_rust.py:14-63`` + ``paddle_rust.py``
— the Rust wheel's `Session.detect(img, preproc_opts, det_opts)` returns
(quads+scores, raw mask). Here the same PP-OCR DB detection pipeline runs as
a jitted JAX graph (models.paddle_det) with the standard DB postprocess; the
preprocessing matches PaddleOCR's det pipeline (resize long side to
detection_size /32-multiple, imagenet normalization).
"""
from __future__ import annotations

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ..models import paddle_det
from ..utils.geometry import Quadrilateral
from .common import OfflineDetector
from .db_postprocess import DBPostprocess

PAD_MULT = 32


@jax.jit
def _forward(params, batch):
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    x = (batch.astype(jnp.float32) / 255.0 - mean) / std
    maps = paddle_det.paddle_det_forward(params, x)
    return maps[..., 0], maps[..., 1]


class PaddleDetector(OfflineDetector):
    # ONNX weight conversion requires the `onnx` package; random init keeps
    # the backend functional in this environment.
    _MODEL_MAPPING = {}

    def __init__(self):
        super().__init__()
        self.params = None

    async def _load(self, device: str):
        onnx_path = self._get_file_path('paddle-det.onnx')
        if onnx_path.is_file():
            try:
                self.params = self._convert_from_onnx(onnx_path)
                return
            except Exception as e:
                self.logger.warning(f'ONNX conversion failed: {e}')
        from ..utils.inference import MissingWeightsError, \
            random_weights_allowed
        if not random_weights_allowed(self):
            raise MissingWeightsError(
                'PaddleDetector: ONNX weights unavailable or unconvertible. '
                'Refusing to detect with random weights; set '
                'MIT_TPU_ALLOW_RANDOM_WEIGHTS=1 to opt in for tests.')
        self.logger.warning('paddle detector weights unavailable — '
                            'using random init')
        self.using_random_weights = True
        self.params = paddle_det.init_params()

    def _convert_from_onnx(self, path):
        """Map the PaddleOCR det ONNX weights onto our JAX params via the
        pure-Python protobuf reader + structural matcher (paddle_onnx.py).
        Raises on any shape mismatch — never serves noise silently."""
        import jax.numpy as jnp
        from ..utils import onnx_lite
        from .paddle_onnx import convert_graph
        graph = onnx_lite.load(path)
        np_params = convert_graph(graph)
        return {k: jnp.asarray(v) for k, v in np_params.items()}

    async def _unload(self):
        self.params = None

    async def _infer(self, image: np.ndarray, detect_size: int,
                     text_threshold: float, box_threshold: float,
                     unclip_ratio: float, verbose: bool = False):
        im_h, im_w = image.shape[:2]
        ratio = detect_size / max(im_h, im_w)
        tw, th = int(round(im_w * ratio)), int(round(im_h * ratio))
        resized = cv2.resize(image, (tw, th), interpolation=cv2.INTER_LINEAR)
        pad_h = (-th) % PAD_MULT
        pad_w = (-tw) % PAD_MULT
        canvas = np.zeros((th + pad_h, tw + pad_w, 3), np.uint8)
        canvas[:th, :tw] = resized

        prob, thresh_map = _forward(self.params, jnp.asarray(canvas)[None])
        prob_np = np.asarray(prob[0], np.float32)[:th, :tw]

        det = DBPostprocess(text_threshold, box_threshold,
                            unclip_ratio=unclip_ratio)
        boxes, scores = det(prob_np, im_w, im_h)
        if boxes.shape[0]:
            keep = boxes.reshape(boxes.shape[0], -1).sum(axis=1) > 0
            boxes, scores = boxes[keep], scores[keep]

        textlines = [Quadrilateral(pts.astype(int), '', float(s))
                     for pts, s in zip(boxes, scores)]
        textlines = [q for q in textlines if q.area > 16]

        raw_mask = np.clip(
            cv2.resize(prob_np, (im_w, im_h),
                       interpolation=cv2.INTER_LINEAR) * 255,
            0, 255).astype(np.uint8)
        return textlines, raw_mask, None
