#!/usr/bin/env python
"""Count synchronous device interactions per page through translate_batch.

The bench e2e lane (bench.bench_e2e) measured a ~4.5 s/page residual on the
dev tunnel = per-call network floor (~45 ms) x the number of device
interactions a page makes OUTSIDE fused jits. On a co-located production
host each interaction is micro-seconds of PCIe/dispatch — but the COUNT is
still the dispatch-overhead budget, and on the tunnel it IS the e2e number.

This script runs the exact bench_e2e workload on CPU with three counters
patched in (compiled-program executions, host->device puts, device->host
reads) and attributes every event to the innermost repo frame, printing an
attack list sorted by count. Run before/after any dispatch-reduction change.

Usage: python devscripts/profiling/e2e_interaction_count.py [n_pages]
"""
import collections
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax

jax.config.update('jax_platforms', 'cpu')
os.environ['MIT_TPU_ALLOW_RANDOM_WEIGHTS'] = '1'

import numpy as np  # noqa: E402

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))

counts = collections.Counter()     # (kind, site) -> n
totals = collections.Counter()     # kind -> n
armed = {'on': False}


def _site() -> str:
    """Innermost stack frame inside the repo package (not this file)."""
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if (fn.startswith(REPO) and 'e2e_interaction_count' not in fn
                and '/tests/' not in fn):
            rel = os.path.relpath(fn, REPO)
            return f'{rel}:{frame.lineno} {frame.name}'
    return '<outside repo>'


def _install():
    from jax._src import array as jarray
    from jax._src import dispatch as jdispatch
    from jax._src.interpreters import pxla

    orig_exec = pxla.ExecuteReplicated.__call__

    def exec_patched(self, *a, **k):
        if armed['on']:
            totals['exec'] += 1
            counts[('exec', _site())] += 1
        return orig_exec(self, *a, **k)
    pxla.ExecuteReplicated.__call__ = exec_patched

    orig_put = jdispatch._batched_device_put_impl

    def put_patched(*a, **k):
        if armed['on']:
            totals['h2d'] += 1
            counts[('h2d', _site())] += 1
        return orig_put(*a, **k)
    jdispatch._batched_device_put_impl = put_patched

    orig_arr = jarray.ArrayImpl.__array__

    def arr_patched(self, *a, **k):
        if armed['on']:
            totals['d2h'] += 1
            counts[('d2h', _site())] += 1
        return orig_arr(self, *a, **k)
    jarray.ArrayImpl.__array__ = arr_patched


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    _install()
    import bench

    # warmup run compiles everything; second run is the counted steady state
    bench.PAGE = bench.PAGE  # noqa: B018 — document the shared workload
    import asyncio
    from PIL import Image
    from manga_image_translator_tpu.config import Config
    from manga_image_translator_tpu.detection import default as det_mod
    from manga_image_translator_tpu.manga_translator import MangaTranslator

    page = 1536
    n_lines = 24
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
            super().__call__(prob, w, h)
            sc = min(w, h) / page
            return fixed_boxes * sc, fixed_scores.copy()

    pil_pages = [Image.fromarray(
        rs.randint(0, 255, (page, page, 3), dtype=np.uint8))
        for _ in range(n_pages)]
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
        print('# warmup (compiles)…', file=sys.stderr, flush=True)
        asyncio.run(mt.translate_batch(work))
        print('# counted run…', file=sys.stderr, flush=True)
        armed['on'] = True
        asyncio.run(mt.translate_batch([(im, cfg) for im in pil_pages]))
        armed['on'] = False
    finally:
        det_mod.DBPostprocess = real_db

    print(f'\n== device interactions for {n_pages} pages '
          f'(per page in parens) ==')
    for kind in ('exec', 'h2d', 'd2h'):
        print(f'{kind:5s}: {totals[kind]:5d}  ({totals[kind]/n_pages:.1f})')
    print(f'TOTAL: {sum(totals.values()):5d}  '
          f'({sum(totals.values())/n_pages:.1f}/page)')
    print('\n== by site ==')
    for (kind, site), n in counts.most_common(40):
        print(f'{n:5d}  {kind:5s}  {site}')


if __name__ == '__main__':
    main()
