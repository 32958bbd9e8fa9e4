"""48px CTC OCR backend (contract: reference ocr/model_48px_ctc.py:18-163 —
checkpoint ocr-ctc.ckpt + alphabet-all-v5.txt, /127.5-1 normalization,
greedy CTC decode with blank=0, per-char 6-channel colors, prob threshold
0.5)."""
from __future__ import annotations

import math
from typing import List

import numpy as np

import jax.numpy as jnp

from ..config import OcrConfig
from ..models import ocr48_ctc
from ..models.torch_loader import convert_state_dict
from ..ops import warp
from ..utils.bubble import is_ignore
from ..utils.geometry import Quadrilateral
from .common import AvgMeter, OfflineOCR, chunks
from .model_48px import WIDTH_BUCKETS, _placeholder_dictionary, bucket_width

TEXT_HEIGHT = 48
MAX_CHUNK = 16


class Model48pxCTCOCR(OfflineOCR):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/ocr-ctc.zip',
            'hash': 'fc61c52f7a811bc72c54f6be85df814c6b60f63585175db27cb94a08e0c30101',
            'archive': {
                'ocr-ctc.ckpt': '.',
                'alphabet-all-v5.txt': '.',
            },
        },
    }

    def __init__(self):
        super().__init__()
        self.params = None
        self.dictionary: List[str] = []

    async def _load(self, device: str):
        dict_path = self._get_file_path('alphabet-all-v5.txt')
        if dict_path.is_file():
            with open(dict_path, encoding='utf-8') as fp:
                self.dictionary = [s.rstrip('\n') for s in fp.readlines()]
        else:
            self.logger.warning('alphabet file unavailable — using '
                                'placeholder dictionary')
            self.dictionary = _placeholder_dictionary()
        self.params = self.load_params_converted(
            'model',
            lambda sd: convert_state_dict(
                {k: v for k, v in sd.items() if not k.endswith('pe.pe')}),
            init_fn=lambda: ocr48_ctc.init_params(len(self.dictionary)))

    async def _unload(self):
        self.params = None

    def _decode_ctc(self, logprobs: np.ndarray, colors: np.ndarray,
                    blank: int = 0):
        """Greedy CTC collapse (reference decode_ctc_top1 :456-504)."""
        preds = logprobs.argmax(-1)
        out = []
        for b in range(logprobs.shape[0]):
            line = []
            last_ch = blank
            for t in range(logprobs.shape[1]):
                ch = int(preds[b, t])
                if ch != last_ch and ch != blank:
                    line.append((ch, float(logprobs[b, t, ch]),
                                 *[float(c) for c in colors[b, t]]))
                last_ch = ch
            out.append(line)
        return out

    async def _infer(self, image: np.ndarray,
                     textlines: List[Quadrilateral], config: OcrConfig,
                     verbose: bool = False) -> List[Quadrilateral]:
        ignore_bubble = config.ignore_bubble
        threshold = 0.5 if config.prob is None else config.prob

        quadrilaterals = list(self._generate_text_direction(textlines))
        out_regions = []

        is_quadrilaterals = bool(
            quadrilaterals
            and isinstance(quadrilaterals[0][0], Quadrilateral))

        # Crop extraction. MEASURED on v5e: the batched device gather
        # costs ~21 ms per 16-crop chunk at bucket 1024 (~1.3 ms/crop
        # at bucket 128) — TPU gathers are slow — vs ~2-5 ms host cv2
        # warps + a negligible upload. Host crops are therefore the
        # DEFAULT; MIT_TPU_DEVICE_CROPS=1 opts into the device path
        # (useful when the host is saturated or remote).
        use_device_crops = (
            is_quadrilaterals and not (1 <= ignore_bubble <= 50)
            and __import__('os').environ
            .get('MIT_TPU_DEVICE_CROPS', '0') == '1')
        if use_device_crops:
            plans = [warp.crop_plan_quad(q, d, TEXT_HEIGHT)
                     for q, d in quadrilaterals]
            widths_all = [p[0] for p in plans]
            img_dev = jnp.asarray(np.ascontiguousarray(image))
        else:
            region_imgs = [q.get_transformed_region(image, d, TEXT_HEIGHT)
                           for q, d in quadrilaterals]
            widths_all = [r.shape[1] for r in region_imgs]

        perm = range(len(quadrilaterals))
        if is_quadrilaterals:
            perm = sorted(range(len(quadrilaterals)),
                          key=lambda x: widths_all[x])

        for indices in chunks(list(perm), MAX_CHUNK):
            widths = [widths_all[i] for i in indices]
            bw = bucket_width(max(widths) + 128)
            skipped = set()
            if use_device_crops:
                valid_widths = np.zeros((MAX_CHUNK,), np.int32)
                valid_widths[:len(indices)] = [min(w, bw) for w in widths]
                Hs = np.stack([plans[i][1] for i in indices]
                              + [warp._DEGENERATE_H]
                              * (MAX_CHUNK - len(indices)))
                # auto-route: separable matmul resampler when every quad
                # is axis-aligned (≲3 ms/chunk), gather path otherwise
                images = warp.crop_batch_auto(img_dev, Hs, valid_widths,
                                              out_h=TEXT_HEIGHT, out_w=bw)
            else:
                batch = np.zeros((MAX_CHUNK, TEXT_HEIGHT, bw, 3), np.uint8)
                for i, idx in enumerate(indices):
                    if (1 <= ignore_bubble <= 50
                            and is_ignore(region_imgs[idx], ignore_bubble)):
                        skipped.add(i)
                        continue
                    w = min(region_imgs[idx].shape[1], bw)
                    batch[i, :, :w, :] = region_imgs[idx][:, :w]
                images = jnp.asarray(batch, jnp.float32) / 127.5 - 1.0
            logprobs, colors = ocr48_ctc.ctc_forward(self.params, images)
            texts = self._decode_ctc(np.asarray(logprobs),
                                     np.asarray(colors))

            for i in range(len(indices)):
                if i in skipped or not texts[i]:
                    continue
                cur_texts = []
                meters = [AvgMeter() for _ in range(6)]
                total_logprob = AvgMeter()
                for (chid, logprob, *cvals) in texts[i]:
                    if chid >= len(self.dictionary):
                        continue
                    ch = self.dictionary[chid]
                    if ch == '<SP>':
                        ch = ' '
                    cur_texts.append(ch)
                    total_logprob(logprob)
                    if ch != ' ':
                        for m, v in zip(meters, cvals):
                            m(int(v * 255))
                prob = float(np.exp(total_logprob()))
                if prob < threshold:
                    continue
                txt = ''.join(cur_texts)
                fr, fg, fb, br, bg, bb = [int(m()) for m in meters]
                self.logger.info(f'prob: {prob} {txt} fg: ({fr}, {fg}, {fb}) '
                                 f'bg: ({br}, {bg}, {bb})')
                cur_region = quadrilaterals[indices[i]][0]
                if isinstance(cur_region, Quadrilateral):
                    cur_region.text = txt
                    cur_region.prob = prob
                    cur_region.fg_r, cur_region.fg_g, cur_region.fg_b = fr, fg, fb
                    cur_region.bg_r, cur_region.bg_g, cur_region.bg_b = br, bg, bb
                else:
                    cur_region.text.append(txt)
                    cur_region.update_font_colors(np.array([fr, fg, fb]),
                                                  np.array([br, bg, bb]))
                out_regions.append(cur_region)

        if is_quadrilaterals:
            return out_regions
        return textlines
