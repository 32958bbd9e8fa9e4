#!/usr/bin/env python
"""End-to-end TPU benchmark: pages/sec/chip (detect + OCR + inpaint) at
1536px — the BASELINE.json north-star metric.

Workload definition (kept fixed across rounds so numbers are comparable):
  * detection: device bilateral prefilter + DBNet-ResNet34 forward on
    1536×1536 pages (bf16), batched 4 pages per forward — the
    translate_batch phase-0 path (cost reported per page) — plus host DB
    postprocess on a realistic prob map
  * OCR: 24 textline crops (48×256), one 24-crop chunk of the 48px
    transformer (the pipeline's text-heavy BIG_CHUNK: 24*5 beam rows = one
    128-row MXU tile), beam k=5, 64 decode steps (typical manga line
    length; random weights never emit the end token, so unbounded decode
    would measure an unrealistic tail)
  * inpainting: the production masked-crop path (context-padded bucket
    crops at the reference's inpainting_size scale) on a representative
    25-line mask, plus the full-page 1536² LaMa-large forward for
    round-over-round comparability

Device work is forced with scalar reductions — stage outputs stay in HBM in
the real pipeline, and this environment tunnels host transfers over the
network, which would swamp the measurement with an artifact.

Measured on this environment's axon tunnel: each jitted CALL costs ~35-60 ms
of network round-trip regardless of compute (a trivial program times at
~35 ms), while iterations INSIDE a device loop are free of that overhead.
Every stage is therefore looped REPS times inside one jitted program with a
serializing data dependency, and the per-call floor (measured with a tiny
program) is subtracted before dividing — otherwise the bench reports tunnel
latency, not TPU time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 20 pages/sec/chip target from
BASELINE.md (the reference publishes no numbers of its own).
"""
import json
import os
import sys
import time

os.environ.setdefault('MIT_TPU_OCR_MAX_LEN', '64')

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: the three stage graphs are large and the TPU may
# sit behind a remote-compile tunnel
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

PAGE = 1536
N_WARMUP = 2
N_ITERS = 5
REPS = 8  # on-device repetitions per jitted call (amortizes tunnel latency)
BASELINE_TARGET = 20.0  # pages/sec/chip north star

_CALL_FLOOR = None


def _call_floor() -> float:
    """Per-call overhead of this environment (tunnel round trip): time of a
    jitted program that does almost nothing."""
    global _CALL_FLOOR
    if _CALL_FLOOR is None:
        x = jnp.zeros((8, 128), jnp.float32)

        @jax.jit
        def tiny(x):
            return x.sum()

        for _ in range(3):
            float(tiny(x))
        t0 = time.perf_counter()
        for _ in range(10):
            float(tiny(x))
        _CALL_FLOOR = (time.perf_counter() - t0) / 10
    return _CALL_FLOOR


def _timed_scalar(fn, *args, n=N_ITERS):
    for _ in range(N_WARMUP):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(fn(*args))
    return (time.perf_counter() - t0) / n


def _timed_onchip(stage_fn, *args, n=N_ITERS):
    """Time ``stage_fn(*args) -> f32 scalar`` per execution, with the
    per-call tunnel overhead amortized over REPS serialized on-device
    repetitions. The loop carry feeds a data-dependent zero back into the
    inputs so XLA cannot hoist the stage out of the loop (float x*0 is not
    algebraically simplified)."""

    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(
                lambda x: x + (s * 0).astype(x.dtype), a)
            return s + stage_fn(*bumped)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    t_call = _timed_scalar(looped, *args, n=n)
    return max(t_call - _call_floor(), 0.0) / REPS


def _bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def bench_detection():
    from manga_image_translator_tpu.detection.db_postprocess import DBPostprocess
    from manga_image_translator_tpu.models.dbnet import dbnet_forward, init_params
    from manga_image_translator_tpu.ops.bilateral import (
        bilateral_filter_batch)

    params = _bf16(init_params(jax.random.PRNGKey(0)))
    rs = np.random.RandomState(0)
    n_batch = 4
    pages = jnp.asarray(
        rs.randint(0, 255, (n_batch, PAGE, PAGE, 3), dtype=np.uint8))

    def run(pages):
        smoothed = bilateral_filter_batch(pages, 17, 80.0, 80.0)
        x = smoothed.astype(jnp.bfloat16) / 127.5 - 1.0
        db, mask = dbnet_forward(params, x)
        prob = jax.nn.sigmoid(db[..., 0].astype(jnp.float32))
        return prob.sum() + mask.astype(jnp.float32).sum()

    t_dev = _timed_onchip(run, pages) / n_batch
    # batched lane: 32-page chunks (the production _batch_predetect
    # MIT_TPU_DET_CHUNK default at <=1536px) — DBNet amortizes 12.2 ->
    # 9.1 -> 8.2 ms/page going batch 8 -> 16 -> 32 (det_misc_ab r5)
    pages32 = jnp.concatenate([pages] * 8, axis=0)
    t_dev8 = _timed_onchip(run, pages32) / (8 * n_batch)

    # host postprocess on a realistic synthetic prob map (~25 textlines)
    prob_np = np.zeros((PAGE, PAGE), np.float32)
    rs2 = np.random.RandomState(3)
    for _ in range(25):
        x, y = rs2.randint(0, PAGE - 300), rs2.randint(0, PAGE - 60)
        prob_np[y:y + 40, x:x + 280] = 0.9
    det = DBPostprocess(0.5, 0.7, unclip_ratio=2.3)
    t0 = time.perf_counter()
    for _ in range(3):
        det(prob_np, PAGE, PAGE)
    t_post = (time.perf_counter() - t0) / 3

    # pipelined postprocess: the production batch path (detection/default.py
    # infer_batch_dispatch + manga_translator._batch_predetect) dispatches
    # the next chunk's device forward, then runs the previous chunk's HOST
    # contour postprocess while the device computes. Measure how much of the
    # host share that overlap actually hides HERE: wall time of
    # [dispatch; REPS*n_batch postprocesses; force] minus [dispatch; force].
    @jax.jit
    def looped(pages):
        def body(i, s):
            bumped = pages + (s * 0).astype(pages.dtype)
            return s + run(bumped)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(looped(pages))                      # warm
    n_posts = REPS * n_batch

    def wall(with_post: bool) -> float:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            h = looped(pages)                 # async dispatch
            if with_post:
                for _ in range(n_posts):
                    det(prob_np, PAGE, PAGE)
            float(h)                          # force completion
            best = min(best, time.perf_counter() - t0)
        return best

    overhead = wall(True) - wall(False)
    t_post_pipe = max(overhead, 0.0) / n_posts
    return t_dev, t_dev8, t_post, min(t_post_pipe, t_post)


def bench_ocr():
    from manga_image_translator_tpu.models import ocr48

    params = _bf16(ocr48.fold_bn(ocr48.init_params(dict_size=7935)))
    rs = np.random.RandomState(1)
    # 24 real crops in one 24-crop chunk — the production BIG_CHUNK: n =
    # 24*5 = 120 beam rows fit ONE 128-row MXU tile, decoding 24 crops at
    # the 16-crop price (ocr/model_48px.py BIG_CHUNK, ocr_chunk_tile_ab.py)
    crops = np.zeros((24, 48, 256, 3), np.uint8)
    crops[:24] = rs.randint(0, 255, (24, 48, 256, 3), dtype=np.uint8)
    crops = jnp.asarray(crops, jnp.float32) / 127.5 - 1.0
    widths = np.zeros((24,), np.int32)
    widths[:24] = [200 + (i % 5) * 10 for i in range(24)]
    widths = jnp.asarray(widths)
    max_len = int(os.environ['MIT_TPU_OCR_MAX_LEN'])

    def run(crops, widths):
        ret = ocr48.beam_decode(params, crops, widths, beams_k=5,
                                max_len=max_len)
        return (ret['probs'].sum()
                + ret['sequences'].astype(jnp.float32).sum())

    return _timed_onchip(run, crops, widths)


def _bench_mask(n_lines=25, seed=3):
    """The bench's representative text mask: ~25 textlines at 1536px (same
    geometry as the detection postprocess workload)."""
    mask = np.zeros((PAGE, PAGE), np.uint8)
    rs = np.random.RandomState(seed)
    for _ in range(n_lines):
        x, y = rs.randint(0, PAGE - 300), rs.randint(0, PAGE - 60)
        mask[y:y + 40, x:x + 280] = 255
    return mask


def bench_inpainting():
    """Returns (t_crop_dev, t_plan_host, t_crop_batched, t_full).

    t_crop_dev: device time of the PRODUCTION masked-crop path (sum of the
      bucket forwards the planner emits for the representative mask).
    t_plan_host: host planning cost (overlappable with device compute in
      the batch pipeline, like the DB postprocess).
    t_crop_batched: per-page device time when 8 pages' crops pool into the
      same buckets (the translate_batch path).
    t_full: the full-page 1536^2 forward — the pre-r4 design, kept for
      round-over-round comparability.
    """
    from manga_image_translator_tpu.inpainting.crop_plan import (
        full_page_path_pixels, pad_batch_size, plan_crops)
    from manga_image_translator_tpu.models import lama

    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, PAGE, PAGE, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, PAGE, PAGE, 1) < 0.1).astype(np.float32))

    def run(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x,
                                          mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        comp = out.astype(jnp.float32) * mask + img * (1 - mask)
        return comp.sum()

    t_full = _timed_onchip(run, img, mask)

    # production masked-crop path (inpainting/crop_plan.py): plan on the
    # representative mask, time each bucket's batched forward
    # production config: inpainting_size=1024 (the config.py default) — the
    # reference full-page path resizes a 1536 page to 1024 before LaMa, so
    # crops plan at scale 2/3 for like-for-like quality
    inp_size = 1024
    scale = min(1.0, inp_size / PAGE)
    mask_np = _bench_mask()
    t0 = time.perf_counter()
    for _ in range(5):
        plan = plan_crops(mask_np, scale=scale,
                          full_page_pixels=full_page_path_pixels(
                              PAGE, PAGE, inp_size))
    t_plan = (time.perf_counter() - t0) / 5
    # batched lane plans are threaded across the page batch in production
    # (inpainting/common._inpaint_crops_multi ThreadPoolExecutor(4)):
    # measure the per-page wall cost of planning 8 pages that way
    from concurrent.futures import ThreadPoolExecutor

    def _p(_i):
        return plan_crops(mask_np, scale=scale,
                          full_page_pixels=full_page_path_pixels(
                              PAGE, PAGE, inp_size))
    with ThreadPoolExecutor(4) as pool:
        list(pool.map(_p, range(8)))          # warm the pool
        t0 = time.perf_counter()
        for _ in range(3):
            list(pool.map(_p, range(8)))
        t_plan_batched = (time.perf_counter() - t0) / (3 * 8)
    assert plan is not None, 'bench mask unexpectedly fell back'
    crops = plan[0]

    buckets = {}
    for c in crops:
        buckets[(c.bh, c.bw)] = buckets.get((c.bh, c.bw), 0) + 1

    def bucket_time(bh, bw, n):
        bimg = jnp.asarray(rs.rand(n, bh, bw, 3).astype(np.float32))
        bmask = jnp.asarray((rs.rand(n, bh, bw, 1) < 0.15
                             ).astype(np.float32))
        return _timed_onchip(run, bimg, bmask)

    t_crop = sum(bucket_time(bh, bw, pad_batch_size(n))
                 for (bh, bw), n in buckets.items())
    # batched lane: 8 pages' crops pooled per bucket
    t_crop_batched = sum(
        bucket_time(bh, bw, pad_batch_size(8 * n))
        for (bh, bw), n in buckets.items()) / 8
    print(f'# inpaint crop plan: {len(crops)} crops '
          f'{ {f"{bh}x{bw}": n for (bh, bw), n in sorted(buckets.items())} }',
          file=sys.stderr)
    return t_crop, t_plan, t_plan_batched, t_crop_batched, t_full


def bench_e2e(n_pages: int = 8, page: int = PAGE, n_lines: int = 24,
              iters: int = 3):
    """MEASURED end-to-end wall-clock through MangaTranslator.translate_batch
    (VERDICT r4 #2) — not a stage sum.

    Workload: ``n_pages`` synthetic 1536px pages, 24 textlines each (the
    stage lanes' geometry), original-translator (keeps text non-empty so
    render+inpaint run), LaMa-large crop inpainting. Weights are random, so
    the detector's boxes would be meaningless — the REAL DB postprocess
    still runs on the real prob map (its cost is measured), but its output
    is replaced with the fixed 24-line set so OCR/merge/mask/inpaint/render
    process a deterministic, representative workload.

    Returns (t_page_raw, t_page_adj, transfer_floor_per_page): raw measured
    seconds/page, the same minus the measured host<->device transfer floor
    (an artifact of this environment's network tunnel — production hosts
    transfer over PCIe), and that floor itself.
    """
    import asyncio
    os.environ['MIT_TPU_ALLOW_RANDOM_WEIGHTS'] = '1'
    from manga_image_translator_tpu.config import Config
    from manga_image_translator_tpu.detection import default as det_mod
    from manga_image_translator_tpu.manga_translator import MangaTranslator

    rs = np.random.RandomState(3)
    boxes = []
    for _ in range(n_lines):
        x, y = rs.randint(0, page - 300), rs.randint(0, page - 60)
        boxes.append([[x, y], [x + 280, y], [x + 280, y + 40], [x, y + 40]])
    fixed_boxes = np.asarray(boxes, np.float32)
    fixed_scores = np.full((n_lines,), 0.9, np.float32)

    real_db = det_mod.DBPostprocess

    class FixedWorkloadDB(real_db):
        def __call__(self, prob, w, h):
            super().__call__(prob, w, h)       # real host postprocess cost
            sc = min(w, h) / PAGE              # scale boxes to detect space
            return fixed_boxes * sc, fixed_scores.copy()

    pages = [rs.randint(0, 255, (page, page, 3), dtype=np.uint8)
             for _ in range(n_pages)]
    from PIL import Image
    pil_pages = [Image.fromarray(p) for p in pages]
    cfg = Config(**{
        'detector': {'detector': 'default', 'detection_size': page},
        'ocr': {'ocr': '48px', 'prob': 0.0},
        'translator': {'translator': 'original', 'target_lang': 'ENG',
                       'enable_post_translation_check': False},
        'inpainter': {'inpainter': 'lama_large', 'inpainting_size': 1024},
    })
    mt = MangaTranslator({'use_gpu': True, 'batch_size': n_pages,
                          'ignore_errors': False})

    det_mod.DBPostprocess = FixedWorkloadDB
    try:
        work = [(im, cfg) for im in pil_pages]
        _progress('e2e warmup (compiles)…')
        ctxs = asyncio.run(mt.translate_batch(work))
        n_ok = sum(1 for c in ctxs if c.result is not None)
        if n_ok != n_pages:
            raise RuntimeError(f'e2e warmup: only {n_ok}/{n_pages} pages '
                               f'produced results')
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            asyncio.run(mt.translate_batch([(im, cfg) for im in pil_pages]))
            best = min(best, time.perf_counter() - t0)
    finally:
        det_mod.DBPostprocess = real_db

    # Transfer floor: this environment tunnels host<->device copies over
    # the network. Measure moving one page batch up and the detection maps
    # down — the pipeline's dominant transfers — and report it separately.
    batch_up = np.stack(pages)
    prob_like = jnp.zeros((n_pages, page, page), jnp.float32)
    mask_like = jnp.zeros((n_pages, page // 2, page // 2), jnp.float32)
    jax.block_until_ready(jnp.asarray(batch_up))
    np.asarray(prob_like); np.asarray(mask_like)
    t0 = time.perf_counter()
    for _ in range(2):
        jax.block_until_ready(jnp.asarray(batch_up))
        np.asarray(prob_like)
        np.asarray(mask_like)
    transfer_floor = (time.perf_counter() - t0) / 2
    t_page_raw = best / n_pages
    t_page_adj = max(best - transfer_floor, 0.0) / n_pages
    return t_page_raw, t_page_adj, transfer_floor / n_pages


def _progress(msg: str):
    """Stage-by-stage progress on stderr: the tunnel can take minutes per
    compile, and a silent 10-minute run is undiagnosable from outside."""
    print(f'# [{time.strftime("%H:%M:%S")}] {msg}', file=sys.stderr,
          flush=True)


def main():
    _progress('detection…')
    t_det, t_det8, t_post, t_post_pipe = bench_detection()
    _progress(f'detection done ({t_det*1000:.1f} ms) — ocr…')
    t_ocr = bench_ocr()
    _progress(f'ocr done ({t_ocr*1000:.1f} ms) — inpainting…')
    t_inp, t_plan, t_plan_b, t_inp_batched, t_inp_full = bench_inpainting()
    _progress('inpainting done — e2e translate_batch…')
    t_e2e_raw = t_e2e_adj = t_xfer = None
    try:
        t_e2e_raw, t_e2e_adj, t_xfer = bench_e2e()
        _progress(f'e2e done ({t_e2e_raw*1000:.1f} ms/page raw, '
                  f'{t_e2e_adj*1000:.1f} adj)')
    except Exception as e:          # never break the driver's JSON line
        _progress(f'e2e lane failed: {type(e).__name__}: {e}')
    per_page = t_det + t_post_pipe + t_ocr + t_inp + t_plan
    pages_per_sec = 1.0 / per_page
    per_page_batched = (t_det8 + t_post_pipe + t_ocr + t_inp_batched
                        + t_plan_b)
    print(f'# detection(dev): {t_det*1000:.1f} ms (b8: {t_det8*1000:.1f}) | '
          f'det post(host): '
          f'{t_post*1000:.1f} ms (pipelined: {t_post_pipe*1000:.1f}) | '
          f'ocr: {t_ocr*1000:.1f} ms | inpaint(crops): '
          f'{t_inp*1000:.1f} ms + plan {t_plan*1000:.1f} ms '
          f'(batched: {t_inp_batched*1000:.1f} + plan {t_plan_b*1000:.1f}, '
          f'full-page: '
          f'{t_inp_full*1000:.1f}) | total {per_page*1000:.1f} ms/page '
          f'({per_page_batched*1000:.1f} batched)',
          file=sys.stderr)
    extra = {}
    if t_e2e_raw is not None:
        # Measured wall-clock through MangaTranslator.translate_batch. On
        # THIS dev environment every device interaction crosses a network
        # tunnel (~25-60 ms per call + bandwidth-limited transfers), so the
        # measured number is a tunnel-bound LOWER bound — see NOTES round-5
        # e2e decomposition. The stage lanes time on-device loops and are
        # the hardware-representative figure.
        extra = {
            'pages_per_sec_e2e_measured': round(1.0 / t_e2e_raw, 3),
            'e2e_ms_per_page_raw': round(t_e2e_raw * 1000, 1),
            'e2e_ms_per_page_minus_transfers': round(t_e2e_adj * 1000, 1),
            'tunnel_transfer_ms_per_page': round(t_xfer * 1000, 1),
            'tunnel_call_floor_ms': round(_call_floor() * 1000, 1),
        }
    print(json.dumps({
        'metric': 'pages_per_sec_per_chip_e2e_1536px',
        'value': round(pages_per_sec, 3),
        'unit': 'pages/s',
        'vs_baseline': round(pages_per_sec / BASELINE_TARGET, 3),
        'pages_per_sec_batched': round(1.0 / per_page_batched, 3),
        'inpaint_crops_ms': round(t_inp * 1000, 1),
        'inpaint_fullpage_ms': round(t_inp_full * 1000, 1),
        **extra,
    }))


if __name__ == '__main__':
    main()
