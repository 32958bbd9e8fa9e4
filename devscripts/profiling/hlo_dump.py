"""Dump + summarize the backend-optimized HLO of a hot graph.

The axon tunnel has no XProf/tensorboard path, but `jit(f).lower(x)
.compile().as_text()` returns the OPTIMIZED HLO of the real TPU
executable — fusion boundaries, standalone copies/transposes, padded
shapes — which is exactly the visibility NOTES wanted for the
"pw convs 6x off roofline" and "glue 20 ms" questions.

Usage:  python hlo_dump.py {lama_block,lama_full,ocr_backbone,dbnet,ocr_step}
Writes /tmp/hlo/<name>.txt and prints:
  * op-kind histogram OUTSIDE fusions (copy/transpose/convolution/...)
  * the 25 largest-output non-fusion ops (bytes estimated from shapes)
  * per-fusion output bytes for the 15 largest fusions
"""
import os
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

DT_BYTES = {'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4, 'u32': 4, 's8': 1,
            'u8': 1, 'pred': 1, 's16': 2, 'u16': 2, 'f64': 8, 's64': 8,
            'u64': 8, 'c64': 8}

_SHAPE_RE = re.compile(r'\b([a-z]+[0-9]*)\[([0-9,]*)\]')
_OP_RE = re.compile(r'^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*\S+\s+'
                    r'([a-z][a-z0-9\-]*)\(')


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def summarize(hlo: str, name: str):
    lines = hlo.splitlines()
    # computation membership: fused computations are named %fused_xxx /
    # listed after `fusion(...) kind=... calls=%...`
    in_fused = False
    kind_hist: dict = {}
    big_ops = []
    fusions = []
    cur_comp = ''
    for ln in lines:
        m = re.match(r'^(%?[\w.\-]+)\s+\(.*\)\s*->', ln)
        if m:
            cur_comp = m.group(1)
            in_fused = 'fused' in cur_comp or 'region' in cur_comp
            continue
        om = _OP_RE.match(ln)
        if not om:
            continue
        op = om.group(1)
        if in_fused:
            continue
        kind_hist[op] = kind_hist.get(op, 0) + 1
        out_b = shape_bytes(ln.split('=', 1)[1].split('(')[0])
        if op == 'fusion':
            fusions.append((out_b, ln.strip()[:160]))
        elif op not in ('parameter', 'constant', 'get-tuple-element',
                        'tuple', 'bitcast'):
            big_ops.append((out_b, op, ln.strip()[:160]))
    print(f'===== {name}: op kinds outside fusions =====')
    for k, v in sorted(kind_hist.items(), key=lambda kv: -kv[1]):
        print(f'  {k:24s} {v}')
    print(f'----- {name}: 25 largest non-fusion ops by output bytes -----')
    for b, op, ln in sorted(big_ops, key=lambda t: -t[0])[:25]:
        print(f'  {b/1e6:8.2f} MB  {op:14s} {ln[:120]}')
    print(f'----- {name}: 15 largest fusions by output bytes -----')
    for b, ln in sorted(fusions, key=lambda t: -t[0])[:15]:
        print(f'  {b/1e6:8.2f} MB  {ln[:130]}')


def get(target: str):
    if target in ('lama_block', 'lama_full'):
        from manga_image_translator_tpu.models import lama
        n_blocks = 18
        params = lama.fold_bn(
            lama.init_params(n_blocks=n_blocks, dtype=jnp.bfloat16),
            n_blocks=n_blocks)
        if target == 'lama_full':
            rs = np.random.RandomState(2)
            img = jnp.asarray(rs.rand(1, 1536, 1536, 3), jnp.bfloat16)
            msk = jnp.asarray((rs.rand(1, 1536, 1536, 1) < 0.1), jnp.bfloat16)

            def fn(img, msk):
                return lama.lama_generator_forward(params, img * (1 - msk),
                                                   msk, n_blocks=n_blocks)
            return fn, (img, msk)
        from manga_image_translator_tpu.models.functional import P
        p = P(params)
        rs = np.random.RandomState(0)
        x_l = jnp.asarray(rs.rand(1, 192, 192, 128), jnp.bfloat16)
        x_g = jnp.asarray(rs.rand(1, 192, 192, 384), jnp.bfloat16)

        def fn(x_l, x_g):
            for i in range(3):
                x_l, x_g = lama._resnet_block(
                    p.scope(f'model.{9 + i}'), x_l, x_g)
            return x_l, x_g
        return fn, (x_l, x_g)
    if target == 'ocr_backbone':
        from manga_image_translator_tpu.models import ocr48
        from manga_image_translator_tpu.models.functional import P
        params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32
                      else v)
                  for k, v in ocr48.init_params(dict_size=7935).items()}
        p = P(params).scope('backbone')
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(32, 48, 256, 3) * 2 - 1, jnp.bfloat16)
        return (lambda im: ocr48.convnext_features(p, im)), (x,)
    if target == 'dbnet':
        from manga_image_translator_tpu.models import dbnet
        params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32
                      else v)
                  for k, v in dbnet.init_params(jax.random.PRNGKey(0)
                                                ).items()}
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(4, 1536, 1536, 3) * 2 - 1, jnp.bfloat16)
        return (lambda im: dbnet.dbnet_forward(params, im)), (x,)
    raise SystemExit(f'unknown target {target}')


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else 'lama_block'
    fn, args = get(target)
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    os.makedirs('/tmp/hlo', exist_ok=True)
    path = f'/tmp/hlo/{target}.txt'
    with open(path, 'w') as f:
        f.write(txt)
    print(f'wrote {path} ({len(txt)/1e6:.1f} MB)')
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = ca.get('flops', float('nan'))
        bts = ca.get('bytes accessed', float('nan'))
        print(f'cost_analysis: {flops/1e9:.1f} GFLOP, '
              f'{bts/1e9:.2f} GB accessed, '
              f'AI={flops/max(bts,1):.1f} flop/B')
    except Exception as e:                                  # noqa: BLE001
        print(f'cost_analysis unavailable: {e}')
    summarize(txt, target)


if __name__ == '__main__':
    main()
