"""Measured per-op timeline via jax.profiler + xprof (VERDICT r2/r3 ask).

Captures a device trace of one stage workload and prints the top HLO ops
by self time — the XProf-level visibility the OCR-backbone question needs
(pw convs measured ~6x off roofline; HLO structure analysis couldn't say
where the time goes).

Usage:
  python devscripts/profiling/xprof_trace.py ocr_backbone [hlo_stats]
  python devscripts/profiling/xprof_trace.py dbnet [op_profile]
  stages: ocr_backbone | dbnet | bilateral | lama | ocr_loop

The conversion uses the `xprof` pip package's bundled native converter
(tensorboard_plugin_profile 2.13's converter is incompatible with the
installed TF). Works on the axon tunnel if the backend supports device
tracing; falls back with a clear error if not.
"""
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

REPS = 8


def _bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def _looped(stage_fn, *args):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + stage_fn(*bumped)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    return looped, args


def make_ocr_backbone():
    from manga_image_translator_tpu.models import ocr48
    params = _bf16(ocr48.init_params(dict_size=7935))
    rs = np.random.RandomState(1)
    crops = jnp.asarray(rs.rand(24, 48, 256, 3).astype(np.float32) * 2 - 1)

    from manga_image_translator_tpu.models.functional import P

    def run(crops):
        feats = ocr48.convnext_features(P(params).scope('backbone'),
                                        crops.astype(jnp.bfloat16))
        return feats.astype(jnp.float32).sum()
    return _looped(run, crops)


def make_ocr_loop():
    from manga_image_translator_tpu.models import ocr48
    params = _bf16(ocr48.init_params(dict_size=7935))
    rs = np.random.RandomState(1)
    crops = jnp.asarray(rs.rand(24, 48, 256, 3).astype(np.float32) * 2 - 1)
    widths = jnp.asarray([200 + (i % 5) * 10 for i in range(24)], jnp.int32)

    def run(crops, widths):
        ret = ocr48.beam_decode(params, crops, widths, beams_k=5, max_len=64)
        return ret['probs'].sum() + ret['sequences'].astype(jnp.float32).sum()
    return _looped(run, crops, widths)


def make_dbnet():
    from manga_image_translator_tpu.models.dbnet import (dbnet_forward,
                                                         init_params)
    params = _bf16(init_params(jax.random.PRNGKey(0)))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(4, 1536, 1536, 3).astype(np.float32) * 2 - 1
                    ).astype(jnp.bfloat16)

    def run(x):
        db, mask = dbnet_forward(params, x)
        return db.astype(jnp.float32).sum() + mask.astype(jnp.float32).sum()
    return _looped(run, x)


def make_bilateral():
    from manga_image_translator_tpu.ops.bilateral import bilateral_filter
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randint(0, 255, (1536, 1536, 3), np.uint8))

    def run(img):
        return bilateral_filter(img, 17, 80.0, 80.0).astype(jnp.float32).sum()
    return _looped(run, img)


def make_lama():
    from manga_image_translator_tpu.models import lama
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, 1536, 1536, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, 1536, 1536, 1) < 0.1).astype(np.float32))

    def run(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x, mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()
    return _looped(run, img, mask)


def make_lama_crop():
    """LaMa at the crop-inpaint production shape (8 x 512x512 bucket)."""
    from manga_image_translator_tpu.models import lama
    params = lama.fold_bn(lama.init_params(n_blocks=18, dtype=jnp.bfloat16),
                          n_blocks=18)
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(8, 512, 512, 3).astype(np.float32))
    mask = jnp.asarray((rs.rand(8, 512, 512, 1) < 0.15).astype(np.float32))

    def run(img, mask):
        x = img.astype(jnp.bfloat16) * (1 - mask.astype(jnp.bfloat16))
        out = lama.lama_generator_forward(params, x,
                                          mask.astype(jnp.bfloat16),
                                          n_blocks=18)
        return out.astype(jnp.float32).sum()
    return _looped(run, img, mask)


STAGES = {
    'ocr_backbone': make_ocr_backbone,
    'ocr_loop': make_ocr_loop,
    'dbnet': make_dbnet,
    'bilateral': make_bilateral,
    'lama': make_lama,
    'lama_crop': make_lama_crop,
}


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else 'ocr_backbone'
    tool = sys.argv[2] if len(sys.argv) > 2 else 'hlo_stats'
    fn, args = STAGES[stage]()

    # warm (compile outside the trace)
    for _ in range(2):
        float(fn(*args))

    tracedir = tempfile.mkdtemp(prefix=f'xprof_{stage}_')
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            float(fn(*args))

    paths = glob.glob(os.path.join(tracedir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        print(f'NO XPLANE CAPTURED under {tracedir} — device tracing '
              'unsupported on this backend', file=sys.stderr)
        sys.exit(1)
    print(f'# xplane: {paths[0]}', file=sys.stderr)

    from xprof.convert import raw_to_tool_data as r2t
    try:
        names = r2t.xspace_to_tool_names(paths)
        print(f'# tools available: {names}', file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f'# tool-name listing failed: {e}', file=sys.stderr)
    data, _ctype = r2t.xspace_to_tool_data(paths, tool, {})
    out = os.path.join(tracedir, f'{stage}_{tool}.out')
    mode = 'wb' if isinstance(data, bytes) else 'w'
    with open(out, mode) as f:
        f.write(data)
    print(f'# raw tool output: {out}', file=sys.stderr)

    # hlo_stats / framework_op_stats come back as gviz JSON-ish strings;
    # print the top rows by the self-time column when parseable
    text = data.decode() if isinstance(data, bytes) else data
    try:
        obj = json.loads(text)
        rows = obj if isinstance(obj, list) else obj.get('rows') or []
        print(json.dumps(rows[:40], indent=1)[:8000])
    except Exception:
        print(text[:8000])


if __name__ == '__main__':
    main()
