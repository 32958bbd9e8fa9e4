#!/usr/bin/env python
"""Per-op TPU timeline via jax.profiler + hand-parsed xplane protobuf.

The VERDICT-r3 ask: the OCR ConvNeXt backbone's pointwise convs measure
~6x off roofline and two rounds of HLO-structure guessing haven't explained
it — this gets the MEASURED per-op device times. tensorboard_plugin_profile's
converter is broken against the installed TF (missing pywrap symbol), so the
xspace is parsed directly with tensorflow.tsl's xplane_pb2 and aggregated
by event name.

Usage: python xprof_opdump.py [ocr_backbone|ocr_step|dbnet|lama] [top_k]
"""
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

REPS = 8


def bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def wl_ocr_backbone():
    from manga_image_translator_tpu.models import ocr48
    from manga_image_translator_tpu.models.functional import P
    params = bf16(ocr48.init_params(dict_size=7935))
    rs = np.random.RandomState(1)
    crops = jnp.asarray(rs.rand(24, 48, 256, 3), jnp.float32) * 2 - 1

    @jax.jit
    def run(c):
        memory = ocr48.convnext_features(P(params).scope('backbone'),
                                         c.astype(jnp.bfloat16))
        return memory.astype(jnp.float32).sum()
    return run, (crops,)


def wl_ocr_step():
    from manga_image_translator_tpu.models import ocr48
    params = bf16(ocr48.init_params(dict_size=7935))
    rs = np.random.RandomState(1)
    crops = jnp.asarray(rs.rand(24, 48, 256, 3), jnp.float32) * 2 - 1
    widths = jnp.asarray([200 + (i % 5) * 10 for i in range(24)], jnp.int32)

    @jax.jit
    def run(c, w):
        ret = ocr48.beam_decode(params, c, w, beams_k=5, max_len=64)
        return (ret['probs'].sum()
                + ret['sequences'].astype(jnp.float32).sum())
    return run, (crops, widths)


def wl_dbnet():
    from manga_image_translator_tpu.models.dbnet import (dbnet_forward,
                                                         init_params)
    params = bf16(init_params(jax.random.PRNGKey(0)))
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(4, 1536, 1536, 3), jnp.bfloat16)

    @jax.jit
    def run(x):
        db, mask = dbnet_forward(params, x)
        return db.astype(jnp.float32).sum() + mask.astype(jnp.float32).sum()
    return run, (x,)


def wl_lama():
    from manga_image_translator_tpu.models import lama
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, 1536, 1536, 3), jnp.bfloat16)
    mask = jnp.asarray((rs.rand(1, 1536, 1536, 1) < 0.1), jnp.bfloat16)

    @jax.jit
    def run(img, mask):
        out = lama.lama_generator_forward(params, img * (1 - mask), mask,
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()
    return run, (img, mask)


WORKLOADS = {'ocr_backbone': wl_ocr_backbone, 'ocr_step': wl_ocr_step,
             'dbnet': wl_dbnet, 'lama': wl_lama}


def dump(xdir: str, top_k: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(xdir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        print('NO xplane.pb produced — device tracing unsupported on this '
              'backend?')
        return
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), 'rb') as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        is_dev = ('TPU' in plane.name or 'Device' in plane.name
                  or 'device' in plane.name)
        if not is_dev:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name not in ('XLA Ops', 'XLA Modules', 'Ops',
                                 'XLA TraceMe', 'Framework Ops'):
                continue
            agg = {}
            for ev in line.events:
                name = md[ev.metadata_id].name
                t, c = agg.get(name, (0, 0))
                agg[name] = (t + ev.duration_ps, c + 1)
            if not agg:
                continue
            total_ps = sum(t for t, _ in agg.values())
            print(f'\n== plane "{plane.name}" line "{line.name}" '
                  f'total {total_ps / 1e9:.3f} ms over {REPS} reps ==')
            for name, (t, c) in sorted(agg.items(),
                                       key=lambda kv: -kv[1][0])[:top_k]:
                print(f'  {t / 1e9:9.3f} ms  x{c:4d}  '
                      f'{t / total_ps * 100:5.1f}%  {name[:110]}')


def main():
    wl = sys.argv[1] if len(sys.argv) > 1 else 'ocr_backbone'
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    run, args = WORKLOADS[wl]()
    for _ in range(3):
        float(run(*args))                    # compile + warm
    xdir = tempfile.mkdtemp(prefix=f'xprof_{wl}_')
    with jax.profiler.trace(xdir):
        for _ in range(REPS):
            float(run(*args))
    print(f'trace dir: {xdir}')
    dump(xdir, top_k)


if __name__ == '__main__':
    main()
