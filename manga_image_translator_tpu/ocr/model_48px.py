"""Default OCR backend: 48px autoregressive recognizer on TPU.

Contract from reference ``ocr/model_48px.py:27-180`` (checkpoint
ocr_ar_48px.ckpt + alphabet-all-v7.txt, /127.5-1 normalization, 16-crop
chunks, beam k=5, prob threshold 0.2, per-char fg/bg color averaging).

TPU specifics: crops are width-sorted, padded into fixed width buckets and a
fixed batch of 16 so the jitted beam-search graph compiles once per bucket;
the decode loop itself is models.ocr48.beam_decode (single XLA program).
"""
from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..config import OcrConfig
from ..models import ocr48
from ..ops import warp
from ..models.torch_loader import convert_state_dict
from ..utils.geometry import Quadrilateral
from ..utils.textblock import TextBlock
from .common import AvgMeter, OfflineOCR, chunks

TEXT_HEIGHT = 48
MAX_CHUNK = 16
# The decode loop's per-step cost is MXU row-TILE-count-bound, not
# row-count-bound: n = crops*k(5) beam rows tile onto 128-row MXU tiles, so
# 24 crops (n=120, ONE tile) decode at the 16-crop (n=80) price — measured
# 33.5 vs 36.0 ms/chunk, 1.39 vs 2.25 ms/crop; 32 crops (n=160, two tiles)
# cost 50.0 ms (devscripts/profiling/ocr_chunk_tile_ab.py, r4). Text-heavy
# pages chunk at 24; light pages keep the lower-latency 16-crop graph.
BIG_CHUNK = 24
# How many consecutive same-bucket chunks share one backbone+encoder
# forward (ocr48.compute_memory). 2 = one 48-crop backbone feeding two
# 24-crop decode loops; the decode loop itself stays at one MXU row tile.
MEM_GROUP_CHUNKS = int(__import__('os').environ
                       .get('MIT_TPU_OCR_MEM_GROUP', 2))
# width buckets bound the number of compiled beam-search graphs
WIDTH_BUCKETS = (64, 128, 192, 256, 384, 512, 768, 1024, 1536)
# Reference decodes up to 255 tokens (model_48px.py:120); overridable so
# CPU test environments can bound the sequential decode work.
MAX_SEQ_LEN = int(__import__('os').environ.get('MIT_TPU_OCR_MAX_LEN', 255))
# First-pass decode budget (_two_tier_decode): crops whose text doesn't
# terminate within this many tokens are re-decoded at MAX_SEQ_LEN.
FAST_SEQ_LEN = int(__import__('os').environ.get('MIT_TPU_OCR_FAST_LEN', 64))
BEAMS = 5


def _placeholder_dictionary() -> List[str]:
    """Offline fallback alphabet with the reference's special tokens at the
    canonical indices (pad=0, start=1, end=2)."""
    specials = ['<PAD>', '<S>', '</S>', '<SP>']
    ascii_chars = [chr(c) for c in range(33, 127)]
    kana = [chr(c) for c in range(0x3041, 0x3097)] + \
           [chr(c) for c in range(0x30A1, 0x30FB)]
    cjk = [chr(c) for c in range(0x4E00, 0x4E00 + 2048)]
    return specials + ascii_chars + kana + cjk


def bucket_width(w: int) -> int:
    target = w + 8  # headroom mirroring the reference's max_width = w + 7
    for b in WIDTH_BUCKETS:
        if target <= b:
            return b
    return WIDTH_BUCKETS[-1]


class Model48pxOCR(OfflineOCR):
    _MODEL_MAPPING = {
        'model': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/ocr_ar_48px.ckpt',
            'hash': '29daa46d080818bb4ab239a518a88338cbccff8f901bef8c9db191a7cb97671d',
        },
        'dict': {
            'url': 'https://github.com/zyddnys/manga-image-translator/releases'
                   '/download/beta-0.3/alphabet-all-v7.txt',
            'hash': 'f5722368146aa0fbcc9f4726866e4efc3203318ebb66c811d8cbbe915576538a',
        },
    }

    def __init__(self):
        super().__init__()
        self.params = None
        self.dictionary: List[str] = []

    async def _load(self, device: str):
        dict_path = self._mapping_file_path('dict')
        if dict_path.is_file():
            with open(dict_path, 'r', encoding='utf-8') as fp:
                self.dictionary = [s.rstrip('\n') for s in fp.readlines()]
        else:
            self.logger.warning('alphabet file unavailable — using '
                                'placeholder dictionary')
            self.dictionary = _placeholder_dictionary()
        dict_size = len(self.dictionary)
        params = self.load_params_converted(
            'model',
            lambda sd: convert_state_dict(
                sd, embedding_patterns=ocr48.EMBEDDING_PATTERNS),
            init_fn=lambda: ocr48.init_params(dict_size))
        if __import__('os').environ.get('MIT_TPU_OCR_FOLD_BN', '1') != '0':
            params = ocr48.fold_bn(params)
        self.params = ocr48.fuse_qkv_params(params)

    async def _unload(self):
        self.params = None

    async def _infer(self, image: np.ndarray,
                     textlines: List[Quadrilateral], config: OcrConfig,
                     verbose: bool = False, ignore_bubble: int = 0
                     ) -> List[Quadrilateral]:
        threshold = 0.2 if config.prob is None else config.prob

        quadrilaterals = list(self._generate_text_direction(textlines))
        out_regions = []

        is_quadrilaterals = bool(
            quadrilaterals
            and isinstance(quadrilaterals[0][0], Quadrilateral))

        # Crop extraction. MEASURED on v5e: the batched device GATHER
        # costs ~21-65 ms per 16-crop chunk (TPU gathers scalarize) vs
        # ~2-5 ms host cv2 warps — but the SEPARABLE matmul resampler
        # (ops/warp, axis-aligned quads only) measures under the tunnel
        # noise floor (≲3 ms/chunk, r3). Default 'auto': device crops
        # when EVERY quad takes the separable path, host cv2 otherwise;
        # MIT_TPU_DEVICE_CROPS=0/1 forces host/device.
        crops_env = __import__('os').environ.get('MIT_TPU_DEVICE_CROPS',
                                                 'auto')
        use_device_crops = is_quadrilaterals and crops_env != '0'
        host_regions: dict = {}
        if use_device_crops:
            plans = [warp.crop_plan_quad(q, d, TEXT_HEIGHT)
                     for q, d in quadrilaterals]
            widths_all = [p[0] for p in plans]
            if crops_env == 'auto':
                # feasibility probe at each quad's own (pre-bucket) width;
                # chunk buckets are only wider, so separable here implies
                # separable at the bucket width
                sep = [warp.separable_plan(H, TEXT_HEIGHT, w,
                                           warp.SEP_SRC_H, 2 * w) is not None
                       for w, H in plans]
                n_host = sum(not s for s in sep)
                if n_host * 2 > len(sep):
                    # mostly rotated/perspective quads: host cv2 wins
                    use_device_crops = False
                else:
                    # mixed per-quad routing: the few rotated quads are
                    # cv2-warped on host and patched over their rows in
                    # the device batch (warp.crop_chunk_mixed)
                    for i, ok in enumerate(sep):
                        if not ok:
                            q, d = quadrilaterals[i]
                            host_regions[i] = q.get_transformed_region(
                                image, d, TEXT_HEIGHT)
        if use_device_crops:
            img_dev = jnp.asarray(np.ascontiguousarray(image))
        else:
            region_imgs = [q.get_transformed_region(image, d, TEXT_HEIGHT)
                           for q, d in quadrilaterals]
            widths_all = [r.shape[1] for r in region_imgs]

        perm = range(len(quadrilaterals))
        if is_quadrilaterals:
            perm = sorted(range(len(quadrilaterals)),
                          key=lambda x: widths_all[x])

        ix = 0
        chunk_size = BIG_CHUNK if len(list(perm)) > MAX_CHUNK else MAX_CHUNK
        # Phase 1: build every chunk and ENQUEUE its fast-tier decode —
        # async dispatch lets chunk N+1's host crop work and dispatch
        # overlap chunk N's device decode.
        built = []
        for indices in chunks(list(perm), chunk_size):
            widths = [widths_all[i] for i in indices]
            bw = bucket_width(max(widths))
            valid_widths = np.zeros((chunk_size,), np.int32)
            valid_widths[:len(indices)] = [min(w, bw) for w in widths]

            if use_device_crops:
                if crops_env == 'auto':
                    # axis-aligned quads (the common case) go through the
                    # separable matmul resampler — no gathers; the rare
                    # rotated quads were host-warped above and are patched
                    # over their rows
                    images = warp.crop_chunk_mixed(
                        img_dev, plans, list(indices), host_regions,
                        valid_widths, TEXT_HEIGHT, bw, chunk_size)
                else:
                    # forced device (MIT_TPU_DEVICE_CROPS=1): gather path
                    # handles arbitrary quads with zero host work
                    Hs = np.stack([plans[i][1] for i in indices]
                                  + [warp._DEGENERATE_H] *
                                  (chunk_size - len(indices)))
                    images = warp.crop_batch_auto(
                        img_dev, Hs, valid_widths,
                        out_h=TEXT_HEIGHT, out_w=bw)
                if verbose:
                    crops_host = np.asarray(
                        (images + 1.0) * 127.5).astype(np.uint8)
                    for i, idx in enumerate(indices):
                        self._dump_crop(crops_host[i],
                                        quadrilaterals[idx][1], ix)
                        ix += 1
            else:
                batch = np.zeros((chunk_size, TEXT_HEIGHT, bw, 3),
                                 dtype=np.uint8)
                for i, idx in enumerate(indices):
                    w = min(region_imgs[idx].shape[1], bw)
                    batch[i, :, :w, :] = region_imgs[idx][:, :w]
                    if verbose:
                        self._dump_crop(batch[i], quadrilaterals[idx][1], ix)
                    ix += 1
                images = jnp.asarray(batch, jnp.float32) / 127.5 - 1.0

            vw = jnp.asarray(valid_widths)
            built.append((indices, images, vw, bw))

        # Backbone batch amortization (memory split): the ConvNeXt backbone
        # runs at 6-19% MXU utilization at 24-crop shapes (r4 xprof — small
        # K,N with fused VPU epilogues), so consecutive same-bucket chunks
        # share ONE backbone+encoder forward (ocr48.compute_memory) whose
        # memory is sliced into per-chunk beam decodes. The long tier also
        # decodes straight from the saved memory — no backbone recompute.
        use_mem = (__import__('os').environ
                   .get('MIT_TPU_OCR_SPLIT_MEMORY', '1') != '0')
        pending = []
        if use_mem:
            g = 0
            while g < len(built):
                group = [built[g]]
                while (len(group) < MEM_GROUP_CHUNKS
                       and g + len(group) < len(built)
                       and built[g + len(group)][1].shape
                       == built[g][1].shape):
                    group.append(built[g + len(group)])
                g += len(group)
                imgs = (jnp.concatenate([c[1] for c in group])
                        if len(group) > 1 else group[0][1])
                vws = (jnp.concatenate([c[2] for c in group])
                       if len(group) > 1 else group[0][2])
                memory, memory_mask = ocr48.sharded_compute_memory(
                    self.params, imgs, vws)
                off = 0
                for indices, images, vw, _bw in group:
                    cs = images.shape[0]
                    mem = (memory[off:off + cs], memory_mask[off:off + cs])
                    off += cs
                    pending.append((indices, images, vw, mem,
                                    self._two_tier_dispatch(images, vw,
                                                            memory=mem)))
        else:
            pending = [(indices, images, vw, None,
                        self._two_tier_dispatch(images, vw))
                       for indices, images, vw, _bw in built]

        # Phase 2: force results in order; long-tier re-decodes (rare)
        # run here, after every chunk's fast pass is already in flight.
        for indices, images, vw, mem, fast_ret in pending:
            ret = self._two_tier_finish(images, vw, fast_ret, memory=mem)
            sequences = np.asarray(ret['sequences'])
            probs = np.asarray(ret['probs'])
            fg = np.asarray(ret['fg'], np.float32)
            bg = np.asarray(ret['bg'], np.float32)
            fg_ind = np.asarray(ret['fg_ind'], np.float32)
            bg_ind = np.asarray(ret['bg_ind'], np.float32)

            for i in range(len(indices)):
                prob = float(probs[i])
                if prob < threshold:
                    continue
                txt, colors = self._decode_tokens(
                    sequences[i], fg[i], bg[i], fg_ind[i], bg_ind[i])
                if txt is None:
                    continue
                fr, fgc, fb, br, bgc, bb = colors
                self.logger.info(
                    f'prob: {prob} {txt} fg: ({fr}, {fgc}, {fb}) '
                    f'bg: ({br}, {bgc}, {bb})')
                cur_region = quadrilaterals[indices[i]][0]
                if isinstance(cur_region, Quadrilateral):
                    cur_region.text = txt
                    cur_region.prob = prob
                    cur_region.fg_r, cur_region.fg_g, cur_region.fg_b = fr, fgc, fb
                    cur_region.bg_r, cur_region.bg_g, cur_region.bg_b = br, bgc, bb
                else:
                    cur_region.text.append(txt)
                    cur_region.update_font_colors(
                        np.array([fr, fgc, fb]), np.array([br, bgc, bb]))
                out_regions.append(cur_region)

        if is_quadrilaterals:
            return out_regions
        return textlines

    async def infer_pooled(self, images: List[np.ndarray],
                           textlines_list: List[List[Quadrilateral]],
                           config: OcrConfig, verbose: bool = False
                           ) -> List[List[Quadrilateral]]:
        """OCR several pages' textlines POOLED into shared decode chunks.

        The decode loop's cost is MXU row-tile-bound (ceil(crops*5/128)),
        so two sparse pages' partial chunks (e.g. 10 + 14 crops = two
        16-crop graphs, ~36 ms each) collapse into ONE 24-crop chunk
        (~34 ms) — near-2x on light pages; dense pages lose nothing. No
        reference equivalent (the reference OCRs strictly per page) —
        this is the SURVEY §2.15 inter-page batching applied to OCR.
        Crops are host cv2 warps (the per-page separable device resampler
        doesn't pool across source images)."""
        threshold = 0.2 if config.prob is None else config.prob
        entries = []          # (page_idx, quad, direction)
        for pi, tls in enumerate(textlines_list):
            for q, d in self._generate_text_direction(tls):
                entries.append((pi, q, d))
        out: List[List[Quadrilateral]] = [[] for _ in images]
        if not entries:
            return out
        if not isinstance(entries[0][1], Quadrilateral):
            # TextBlock inputs: keep the per-page path
            for pi, tls in enumerate(textlines_list):
                out[pi] = await self._infer(images[pi], tls, config,
                                            verbose)
            return out

        region_imgs = [q.get_transformed_region(images[pi], d, TEXT_HEIGHT)
                       for pi, q, d in entries]
        widths_all = [r.shape[1] for r in region_imgs]
        perm = sorted(range(len(entries)), key=lambda i: widths_all[i])
        chunk_size = BIG_CHUNK if len(entries) > MAX_CHUNK else MAX_CHUNK

        built = []
        for indices in chunks(perm, chunk_size):
            widths = [widths_all[i] for i in indices]
            bw = bucket_width(max(widths))
            valid_widths = np.zeros((chunk_size,), np.int32)
            valid_widths[:len(indices)] = [min(w, bw) for w in widths]
            batch = np.zeros((chunk_size, TEXT_HEIGHT, bw, 3), np.uint8)
            for k, idx in enumerate(indices):
                w = min(region_imgs[idx].shape[1], bw)
                batch[k, :, :w, :] = region_imgs[idx][:, :w]
            built.append((indices, jnp.asarray(batch, jnp.float32)
                          / 127.5 - 1.0, jnp.asarray(valid_widths)))

        pending = []
        for indices, imgs_j, vw in built:
            mem = ocr48.sharded_compute_memory(self.params, imgs_j, vw)
            pending.append((indices, imgs_j, vw, mem,
                            self._two_tier_dispatch(imgs_j, vw,
                                                    memory=mem)))
        for indices, imgs_j, vw, mem, fast_ret in pending:
            ret = self._two_tier_finish(imgs_j, vw, fast_ret, memory=mem)
            sequences = np.asarray(ret['sequences'])
            probs = np.asarray(ret['probs'])
            fg = np.asarray(ret['fg'], np.float32)
            bg = np.asarray(ret['bg'], np.float32)
            fg_ind = np.asarray(ret['fg_ind'], np.float32)
            bg_ind = np.asarray(ret['bg_ind'], np.float32)
            for k, idx in enumerate(indices):
                prob = float(probs[k])
                if prob < threshold:
                    continue
                txt, colors = self._decode_tokens(
                    sequences[k], fg[k], bg[k], fg_ind[k], bg_ind[k])
                if txt is None:
                    continue
                fr, fgc, fb, br, bgc, bb = colors
                self.logger.info(
                    f'prob: {prob} {txt} fg: ({fr}, {fgc}, {fb}) '
                    f'bg: ({br}, {bgc}, {bb})')
                pi, cur_region, _d = entries[idx]
                cur_region.text = txt
                cur_region.prob = prob
                cur_region.fg_r, cur_region.fg_g, cur_region.fg_b = \
                    fr, fgc, fb
                cur_region.bg_r, cur_region.bg_g, cur_region.bg_b = \
                    br, bgc, bb
                out[pi].append(cur_region)
        return out

    def _two_tier_decode(self, images, valid_widths):
        """Beam decode with a short first pass.

        Almost all manga textlines fit FAST_SEQ_LEN tokens; decoding at
        the full MAX_SEQ_LEN (255, reference model_48px.py:120) makes the
        KV caches and the per-step streamed attention ~4x larger. So:
        decode at FAST_SEQ_LEN first and re-decode the (rare) crops whose
        best sequence never produced </S> with the full-length graph —
        outputs are identical to a single MAX_SEQ_LEN pass for every
        sequence that terminates within the short budget.
        """
        return self._two_tier_finish(images, valid_widths,
                                     self._two_tier_dispatch(images,
                                                             valid_widths))

    def _two_tier_dispatch(self, images, valid_widths, memory=None):
        """Enqueue the fast-tier decode WITHOUT host sync — JAX dispatch
        is async, so _infer can enqueue every chunk's fast pass (and do
        the next chunk's host-side crop warps) while the device works.
        ``memory``: optional precomputed (memory, memory_mask) — the
        decode then skips the backbone (memory-split path)."""
        fast = min(FAST_SEQ_LEN, MAX_SEQ_LEN)
        if memory is not None:
            return ocr48.sharded_beam_decode_from_memory(
                self.params, memory[0], memory[1], beams_k=BEAMS,
                max_len=fast)
        return ocr48.sharded_beam_decode(self.params, images, valid_widths,
                                         beams_k=BEAMS, max_len=fast)

    def _two_tier_finish(self, images, valid_widths, ret, memory=None):
        fast = min(FAST_SEQ_LEN, MAX_SEQ_LEN)
        if fast >= MAX_SEQ_LEN:
            return ret
        seqs = np.asarray(ret['sequences'])
        unfinished = ~(seqs == ocr48.END_TOK).any(axis=1)
        # padded all-zero batch rows decode to </S> immediately
        if not unfinished.any():
            return ret
        idx = np.where(unfinished)[0]
        self.logger.info(f'{len(idx)} lines exceeded '
                         f'{fast} tokens — re-decoding at {MAX_SEQ_LEN}')
        # Long-tier cost scales with the beam batch (n = crops * k), so
        # re-decode ONLY the unfinished rows, compacted into the smaller
        # MAX_CHUNK bucket when they fit (the (16, bucket) graph is the
        # same one small pages compile anyway). Padding rows get width 0
        # (image path) or duplicate a live row (memory path — duplicates
        # finish with their source, adding no steps).
        n_rows = images.shape[0]
        if len(idx) <= MAX_CHUNK < n_rows:
            take = np.full((MAX_CHUNK,), int(idx[0]), np.int32)
            take[:len(idx)] = idx
            take_j = jnp.asarray(take)
            if memory is not None:
                full = ocr48.sharded_beam_decode_from_memory(
                    self.params, jnp.take(memory[0], take_j, axis=0),
                    jnp.take(memory[1], take_j, axis=0), beams_k=BEAMS,
                    max_len=MAX_SEQ_LEN)
            else:
                sub_imgs = jnp.take(jnp.asarray(images), take_j, axis=0)
                live = (np.arange(MAX_CHUNK) < len(idx)).astype(np.int32)
                sub_w = (jnp.take(valid_widths, take_j, axis=0)
                         * jnp.asarray(live))
                full = ocr48.sharded_beam_decode(self.params, sub_imgs,
                                                 sub_w, beams_k=BEAMS,
                                                 max_len=MAX_SEQ_LEN)
            src_rows = np.arange(len(idx))
        elif memory is not None:
            full = ocr48.sharded_beam_decode_from_memory(
                self.params, memory[0], memory[1], beams_k=BEAMS,
                max_len=MAX_SEQ_LEN)
            src_rows = idx
        else:
            full = ocr48.sharded_beam_decode(self.params, images,
                                             valid_widths, beams_k=BEAMS,
                                             max_len=MAX_SEQ_LEN)
            src_rows = idx
        out = {}
        for key in ret:
            # np.asarray of a device array is a read-only view — copy
            # before the row assignment below (measured crash on v5e)
            a = np.array(ret[key])
            b = np.asarray(full[key])
            # time axes differ (fast vs MAX_SEQ_LEN) — pad fast result
            if a.ndim >= 2 and a.shape[1] != b.shape[1]:
                pad = [(0, 0)] * a.ndim
                pad[1] = (0, b.shape[1] - a.shape[1])
                fill = ocr48.END_TOK if key == 'sequences' else 0
                a = np.pad(a, pad, constant_values=fill)
            a[idx] = b[src_rows]
            out[key] = a
        return out

    def _dump_crop(self, crop: np.ndarray, direction: str, index: int):
        """Debug crop dump (reference model_48px.py:90-113; directory
        overridable via MANGA_OCR_RESULT_DIR)."""
        import os
        import cv2
        out_dir = os.environ.get('MANGA_OCR_RESULT_DIR', 'result/ocrs/')
        os.makedirs(out_dir, exist_ok=True)
        img = cv2.cvtColor(crop, cv2.COLOR_RGB2BGR)
        if direction == 'v':
            img = cv2.rotate(img, cv2.ROTATE_90_CLOCKWISE)
        # cap debug crops at 200px and compress hard (ref :100-112)
        h, w = img.shape[:2]
        if max(h, w) > 200:
            scale = 200 / max(h, w)
            img = cv2.resize(img, (int(w * scale), int(h * scale)),
                             interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(out_dir, f'{index}.png'), img,
                    [cv2.IMWRITE_PNG_COMPRESSION, 9])

    def _decode_tokens(self, seq: np.ndarray, fg: np.ndarray, bg: np.ndarray,
                       fg_ind: np.ndarray, bg_ind: np.ndarray):
        """Token ids + per-step color predictions → (text, avg colors).

        Mirrors reference model_48px.py:121-160 (AvgMeter color averaging,
        has_fg/has_bg gates, bg falls back to fg when absent).
        """
        has_fg = fg_ind[:, 1] > fg_ind[:, 0]
        has_bg = bg_ind[:, 1] > bg_ind[:, 0]
        seq_chars = []
        fr, fgc, fb = AvgMeter(), AvgMeter(), AvgMeter()
        br, bgc, bb = AvgMeter(), AvgMeter(), AvgMeter()
        for t, chid in enumerate(seq):
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
            seq_chars.append(ch)
            if bool(has_fg[t]):
                fr(int(fg[t, 0] * 255))
                fgc(int(fg[t, 1] * 255))
                fb(int(fg[t, 2] * 255))
            if bool(has_bg[t]):
                br(int(bg[t, 0] * 255))
                bgc(int(bg[t, 1] * 255))
                bb(int(bg[t, 2] * 255))
            else:
                br(int(fg[t, 0] * 255))
                bgc(int(fg[t, 1] * 255))
                bb(int(fg[t, 2] * 255))
        txt = ''.join(seq_chars)
        if not txt:
            return None, None
        clamp = lambda v: min(max(int(v), 0), 255)
        return txt, (clamp(fr()), clamp(fgc()), clamp(fb()),
                     clamp(br()), clamp(bgc()), clamp(bb()))
