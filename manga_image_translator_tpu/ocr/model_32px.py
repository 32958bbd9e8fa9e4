"""32px OCR backend (contract: reference ocr/model_32px.py:19-141 —
checkpoint ocr.ckpt in ocr.zip, 32px crops, beam k=5, prob threshold 0.2,
clipped-mean per-char colors)."""
from __future__ import annotations

from typing import List

import numpy as np

import jax.numpy as jnp

from ..config import OcrConfig
from ..models import ocr32
from ..ops import warp
from ..models.torch_loader import convert_state_dict
from ..utils.geometry import Quadrilateral
from .common import OfflineOCR, chunks
from .model_48px import MAX_SEQ_LEN, _placeholder_dictionary, bucket_width

TEXT_HEIGHT = 32
MAX_CHUNK = 16


class Model32pxOCR(OfflineOCR):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/ocr.zip',
            'hash': '47405638b96fa2540a5ee841a4cd792f25062c09d9458a973362d40785f95d7a',
            'archive': {
                'ocr.ckpt': '.',
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
                {k: v for k, v in sd.items() if not k.endswith('pe.pe')},
                embedding_patterns=ocr32.EMBEDDING_PATTERNS),
            init_fn=lambda: ocr32.init_params(len(self.dictionary)))

    async def _unload(self):
        self.params = None

    async def _infer(self, image: np.ndarray,
                     textlines: List[Quadrilateral], config: OcrConfig,
                     verbose: bool = False) -> List[Quadrilateral]:
        threshold = 0.2 if config.prob is None else config.prob

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
        use_device_crops = (is_quadrilaterals and
                            __import__('os').environ
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
            bw = bucket_width(max(widths))
            valid_widths = np.zeros((MAX_CHUNK,), np.int32)
            valid_widths[:len(indices)] = [min(w, bw) for w in widths]

            if use_device_crops:
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
                    w = min(region_imgs[idx].shape[1], bw)
                    batch[i, :, :w, :] = region_imgs[idx][:, :w]
                images = jnp.asarray(batch, jnp.float32) / 127.5 - 1.0
            ret = ocr32.beam_decode(self.params, images,
                                    jnp.asarray(valid_widths), beams_k=5,
                                    max_len=MAX_SEQ_LEN)
            sequences = np.asarray(ret['sequences'])
            probs = np.asarray(ret['probs'])
            colors = np.asarray(ret['colors'], np.float32)

            for i in range(len(indices)):
                prob = float(probs[i])
                if prob < threshold:
                    continue
                seq = []
                n_chars = 0
                for chid in sequences[i]:
                    chid = int(chid)
                    if chid >= len(self.dictionary):
                        continue
                    ch = self.dictionary[chid]
                    if ch == '<S>':
                        continue
                    if ch == '</S>':
                        break
                    if ch == '<SP>':
                        ch = ' '
                    seq.append(ch)
                    n_chars += 1
                txt = ''.join(seq)
                if not txt:
                    continue
                # colors: mean over the sequence, clipped (reference :104-109)
                cmean = colors[i, :max(n_chars, 1)].mean(axis=0)
                fr, fg, fb, br, bg, bb = [int(np.clip(v, 0, 1) * 255)
                                          for v in cmean]
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
