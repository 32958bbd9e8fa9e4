"""ComicTextDetector wrapper on TPU.

Contract from reference ``detection/ctd.py:62-186``: /255 normalization,
1024px letterbox (stride 64), webtoon rearrange, DB seg-representer with
thresh 0.3 + box_thresh 0.6 on the line maps, ctd textmask refinement as the
raw mask. The reference runs torch on GPU and ONNX-via-cv2.dnn on CPU; here
one jitted JAX graph serves both.
"""
from __future__ import annotations

import functools

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from ..models import ctd as ctd_model
from ..models.torch_loader import convert_state_dict
from ..ops.tiling import extract_squares, needs_tiling, plan_tiles, stitch_maps
from ..utils.geometry import Quadrilateral
from .common import OfflineDetector
from .ctd_textmask import refine_mask
from .db_postprocess import DBPostprocess

STRIDE = 64


@jax.jit
def _forward_batch(params, batch):
    x = batch.astype(jnp.float32) / 255.0
    mask, lines = ctd_model.ctd_forward(params, x)
    return mask[..., 0], lines


class ComicTextDetector(OfflineDetector):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/comictextdetector.pt',
            'hash': '1f90fa60aeeb1eb82e2ac1167a66bf139a8a61b8780acd351ead55268540cccb',
            'file': '.',
        },
    }

    def __init__(self, input_size: int = 1024, conf_thresh: float = 0.4,
                 nms_thresh: float = 0.35):
        super().__init__()
        self.params = None
        self.input_size = input_size
        self.conf_thresh = conf_thresh
        self.nms_thresh = nms_thresh

    async def _load(self, device: str):
        def convert(sd):
            flat = {}
            for part in ('blk_det', 'text_seg', 'text_det'):
                sub = sd.get(part, {})
                if part == 'blk_det' and isinstance(sub, dict) \
                        and 'weights' in sub:
                    sub = sub['weights']
                for k, v in sub.items():
                    flat[f'{part}.{k}'] = v
            return convert_state_dict(
                flat,
                transposed_conv_patterns=ctd_model.TRANSPOSED_CONV_PATTERNS)
        self.params = self.load_params_converted(
            'model', convert, init_fn=ctd_model.init_params)

    async def _unload(self):
        self.params = None

    def _batch_forward(self, batch: jax.Array):
        return _forward_batch(self.params, batch)

    async def _infer(self, image: np.ndarray, detect_size: int,
                     text_threshold: float, box_threshold: float,
                     unclip_ratio: float, verbose: bool = False):
        im_h, im_w = image.shape[:2]
        size = self.input_size

        if needs_tiling(im_h, im_w, size):
            plan = plan_tiles(im_h, im_w, size)
            squares = extract_squares(jnp.asarray(image), plan)
            n, s = squares.shape[0], squares.shape[1]
            batch = jax.image.resize(squares.astype(jnp.float32),
                                     (n, size, size, 3), 'linear')
            mask, lines = self._batch_forward(batch)
            mask_full = np.asarray(stitch_maps(
                jax.image.resize(mask[..., None], (n, s, s, 1), 'linear'),
                plan)[..., 0], np.float32)
            shrink_full = np.asarray(stitch_maps(
                jax.image.resize(lines[..., 0:1], (n, s, s, 1), 'linear'),
                plan)[..., 0], np.float32)
            mask_np = np.clip(mask_full * 255, 0, 255).astype(np.uint8)
            prob_np = shrink_full
            dest_w, dest_h = im_w, im_h
        else:
            # letterbox to input_size square, stride 64
            ratio = size / max(im_h, im_w)
            tw, th = int(round(im_w * ratio)), int(round(im_h * ratio))
            resized = cv2.resize(image, (tw, th),
                                 interpolation=cv2.INTER_LINEAR)
            pw = (-tw) % STRIDE
            ph = (-th) % STRIDE
            canvas = np.full((th + ph, tw + pw, 3), 114, np.uint8)
            canvas[:th, :tw] = resized
            mask, lines = self._batch_forward(jnp.asarray(canvas)[None])
            mask_np = np.clip(np.asarray(mask[0], np.float32) * 255,
                              0, 255).astype(np.uint8)
            mask_np = mask_np[:th, :tw]
            # line maps are at full network-input resolution; trim the pads
            prob_np = np.asarray(lines[0, :th, :tw, 0], np.float32)
            dest_w, dest_h = im_w, im_h

        det = DBPostprocess(thresh=0.3, box_thresh=0.6,
                            unclip_ratio=unclip_ratio)
        boxes, scores = det(prob_np, dest_w, dest_h)
        if boxes.shape[0]:
            keep = boxes.reshape(boxes.shape[0], -1).sum(axis=1) > 0
            boxes, scores = boxes[keep], scores[keep]

        textlines = [Quadrilateral(pts.astype(int), '', float(s))
                     for pts, s in zip(boxes, scores)]
        textlines = [q for q in textlines if q.area > 16]

        mask_resized = cv2.resize(mask_np, (im_w, im_h),
                                  interpolation=cv2.INTER_LINEAR)
        mask_refined = refine_mask(image, mask_resized, textlines,
                                   refine_mode=None)
        return textlines, mask_refined, None
