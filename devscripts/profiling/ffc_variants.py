"""FFC/FourierUnit optimization variants — on-chip amortized timings.

Round-1 measurements: 36 spectral transforms ~= 40 ms/page of the ~110 ms
LaMa total, but the DFT matmuls themselves are only ~0.2 ms each. Hypothesis:
the cost is the interleave/concat copies and layout churn around the conv,
plus per-op overhead of separate BN ops. Variants:

  v0: current _fourier_unit (joint matmuls + stack-interleave + BN op)
  v1: separate re/im matmul formulation, zero concats/copies, BN folded
      into the conv blocks (4 half-size matmuls)
  v2: v1 for the whole SpectralTransform (conv1/conv2 BN-folded)
  v3: resnet FFC layer baseline vs optimized (fused l2l+l2g conv, folded BN)

Run: python devscripts/profiling/ffc_variants.py  (on the TPU)
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models.lama import (
    _fourier_unit, _spectral_transform, _resnet_block, _dft_mats, _PREC,
    init_params)
from manga_image_translator_tpu.models.functional import P

H = W = 192
CG = 384          # global channels in lama-large resnet blocks
CL = 128
C = CG // 2       # FU operates at cg/2 = 192
K = W // 2 + 1
DT = jnp.bfloat16

rs = np.random.RandomState(0)

# ---------------------------------------------------------------- DFT mats
cos_w, sin_w, cos_h, sin_h, inv_cos_w, inv_sin_w, norm = _dft_mats(H, W)
# fold the ortho norm once into each direction
COS_W = cos_w * norm ** 0.5
SIN_W = sin_w * norm ** 0.5
COS_HT = (cos_h.T * norm ** 0.5).astype(np.float32)
SIN_HT = (sin_h.T * norm ** 0.5).astype(np.float32)
INV_COS_W = (inv_cos_w * norm ** 0.5).astype(np.float32)
INV_SIN_W = (inv_sin_w * norm ** 0.5).astype(np.float32)
# forward H mats (un-transposed)
COS_H = (cos_h * norm ** 0.5).astype(np.float32)
SIN_H = (sin_h * norm ** 0.5).astype(np.float32)


def _mm(spec, x, m):
    return jnp.einsum(spec, x, jnp.asarray(m), precision=_PREC)


def fu_v1(x, blocks):
    """Separate re/im formulation, zero copies, conv+BN folded into 4
    half-matmuls. x: (1, H, W, C) bf16."""
    (a_re, b_re, a_im, b_im, t_re, t_im) = blocks
    f = x.astype(jnp.float32)
    re_w = _mm('nhwc,wk->nhkc', f, COS_W)
    im_w = -_mm('nhwc,wk->nhkc', f, SIN_W)
    re = (_mm('nhkc,hj->njkc', re_w, COS_H)
          + _mm('nhkc,hj->njkc', im_w, SIN_H))
    im = (_mm('nhkc,hj->njkc', im_w, COS_H)
          - _mm('nhkc,hj->njkc', re_w, SIN_H))
    re = re.astype(DT)
    im = im.astype(DT)
    y_re = jax.nn.relu(jnp.einsum('nhkc,cd->nhkd', re, a_re,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum('nhkc,cd->nhkd', im, b_re,
                                    preferred_element_type=jnp.float32)
                       + t_re).astype(jnp.float32)
    y_im = jax.nn.relu(jnp.einsum('nhkc,cd->nhkd', re, a_im,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum('nhkc,cd->nhkd', im, b_im,
                                    preferred_element_type=jnp.float32)
                       + t_im).astype(jnp.float32)
    re_h = (_mm('njkc,jh->nhkc', y_re, COS_HT)
            - _mm('njkc,jh->nhkc', y_im, SIN_HT))
    im_h = (_mm('njkc,jh->nhkc', y_re, SIN_HT)
            + _mm('njkc,jh->nhkc', y_im, COS_HT))
    out = (_mm('nhkc,kw->nhwc', re_h, INV_COS_W)
           - _mm('nhkc,kw->nhwc', im_h, INV_SIN_W))
    return out.astype(x.dtype)


def make_fu_blocks(params, prefix, dtype=DT):
    """Split the interleaved 2C->2C FU conv into re/im blocks + fold BN."""
    w = np.asarray(params[f'{prefix}.conv_layer.weight'],
                   np.float32)[0, 0]          # (2C, 2C) in interleaved order
    g = np.asarray(params[f'{prefix}.bn.weight'], np.float32)
    b = np.asarray(params[f'{prefix}.bn.bias'], np.float32)
    mu = np.asarray(params[f'{prefix}.bn.running_mean'], np.float32)
    var = np.asarray(params[f'{prefix}.bn.running_var'], np.float32)
    s = g / np.sqrt(var + 1e-5)
    t = b - mu * s
    w = w * s[None, :]                         # fold scale into out cols
    a = w[0::2]                                # rows taking re input
    bb = w[1::2]                               # rows taking im input
    return (jnp.asarray(a[:, 0::2], dtype), jnp.asarray(bb[:, 0::2], dtype),
            jnp.asarray(a[:, 1::2], dtype), jnp.asarray(bb[:, 1::2], dtype),
            jnp.asarray(t[0::2], jnp.float32),
            jnp.asarray(t[1::2], jnp.float32))


def fold_conv_bn(params, conv_key, bn_key, dtype=DT):
    """-> (w, bias) with BN folded into a bias-free conv."""
    w = np.asarray(params[f'{conv_key}.weight'], np.float32)
    g = np.asarray(params[f'{bn_key}.weight'], np.float32)
    b = np.asarray(params[f'{bn_key}.bias'], np.float32)
    mu = np.asarray(params[f'{bn_key}.running_mean'], np.float32)
    var = np.asarray(params[f'{bn_key}.running_var'], np.float32)
    s = g / np.sqrt(var + 1e-5)
    t = b - mu * s
    return jnp.asarray(w * s[None, None, None, :], dtype), jnp.asarray(
        t, jnp.float32)


def conv3(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)


def conv1x1(x, w):
    return jnp.einsum('nhwc,cd->nhwd', x, w[0, 0],
                      preferred_element_type=jnp.float32)


def timed(fn, *args, n=8, reps=16):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            return s + fn(*bumped)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    for _ in range(3):
        float(looped(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(looped(*args))
    t_call = (time.perf_counter() - t0) / n

    # call floor
    @jax.jit
    def tiny(x):
        return x[0].sum() if isinstance(x, tuple) else x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    for _ in range(3):
        float(tiny(z))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(z))
    floor = (time.perf_counter() - t0) / 10
    return max(t_call - floor, 0.0) / reps


def main():
    params = init_params(n_blocks=1)
    params = {k: (v.astype(DT) if v.dtype == jnp.float32 else v)
              for k, v in params.items()}
    pre = 'model.5.conv1.ffc.convg2g'
    fu_p = P(params).scope(f'{pre}.fu')

    x = jnp.asarray(rs.rand(1, H, W, C).astype(np.float32), DT)

    # correctness check v1 vs v0
    blocks = make_fu_blocks(params, f'{pre}.fu')
    y0 = jax.jit(lambda x: _fourier_unit(fu_p, x))(x)
    y1 = jax.jit(lambda x: fu_v1(x, blocks))(x)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                - y1.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(y0.astype(jnp.float32)))) + 1e-9
    print(f'FU v1 max abs err: {err:.5f} (rel {err/ref:.5f})')

    t0 = timed(lambda x: _fourier_unit(fu_p, x).astype(jnp.float32).sum(), x)
    t1 = timed(lambda x: fu_v1(x, blocks).astype(jnp.float32).sum(), x)
    print(f'FU v0 baseline : {t0*1e3:.3f} ms')
    print(f'FU v1 no-copy  : {t1*1e3:.3f} ms')

    # ---- full spectral transform ----
    st_p = P(params).scope(pre)
    xg = jnp.asarray(rs.rand(1, H, W, CG).astype(np.float32), DT)
    w1, t1b = fold_conv_bn(params, f'{pre}.conv1.0', f'{pre}.conv1.1')
    w2 = params[f'{pre}.conv2.weight'].astype(DT)

    def spectral_v2(xg):
        h = jax.nn.relu(conv1x1(xg, w1) + t1b).astype(DT)
        out = fu_v1(h, blocks)
        return conv1x1(h + out, w2).astype(DT)

    ys0 = jax.jit(lambda x: _spectral_transform(st_p, x))(xg)
    ys1 = jax.jit(spectral_v2)(xg)
    err = float(jnp.max(jnp.abs(ys0.astype(jnp.float32)
                                - ys1.astype(jnp.float32))))
    print(f'spectral v2 max abs err: {err:.5f}')
    ts0 = timed(lambda x: _spectral_transform(st_p, x)
                .astype(jnp.float32).sum(), xg)
    ts1 = timed(lambda x: spectral_v2(x).astype(jnp.float32).sum(), xg)
    print(f'spectral v0: {ts0*1e3:.3f} ms   v2: {ts1*1e3:.3f} ms')

    # ---- one FFC resnet layer (conv1 of a block) ----
    bp = P(params).scope('model.5')
    xl = jnp.asarray(rs.rand(1, H, W, CL).astype(np.float32), DT)

    # baseline whole resnet block
    tb0 = timed(lambda a, b: sum(o.astype(jnp.float32).sum()
                                 for o in _resnet_block(bp, a, b)), xl, xg)
    print(f'resnet block v0: {tb0*1e3:.3f} ms')

    # optimized FFC layer: fused l2l+l2g conv (128->512 on x_l), folded BNs
    def make_ffc_opt(pfx):
        wl2l, _ = fold_conv_bn(params, f'{pfx}.ffc.convl2l', f'{pfx}.bn_l')
        wl2g, _ = fold_conv_bn(params, f'{pfx}.ffc.convl2g', f'{pfx}.bn_g')
        wg2l, tl = fold_conv_bn(params, f'{pfx}.ffc.convg2l', f'{pfx}.bn_l')
        # g-path spectral: conv2 output gets bn_g folded
        sg = np.asarray(params[f'{pfx}.bn_g.weight'], np.float32)
        bg = np.asarray(params[f'{pfx}.bn_g.bias'], np.float32)
        mg = np.asarray(params[f'{pfx}.bn_g.running_mean'], np.float32)
        vg = np.asarray(params[f'{pfx}.bn_g.running_var'], np.float32)
        s = sg / np.sqrt(vg + 1e-5)
        tg = bg - mg * s
        w1f, t1f = fold_conv_bn(params, f'{pfx}.ffc.convg2g.conv1.0',
                                f'{pfx}.ffc.convg2g.conv1.1')
        w2f = (np.asarray(params[f'{pfx}.ffc.convg2g.conv2.weight'],
                          np.float32) * s[None, None, None, :])
        blk = make_fu_blocks(params, f'{pfx}.ffc.convg2g.fu')
        wl_fused = jnp.concatenate([wl2l, wl2g], axis=-1)   # (3,3,128,512)
        return (wl_fused, wg2l, jnp.asarray(tl, jnp.float32),
                jnp.asarray(tg, jnp.float32), w1f, t1f,
                jnp.asarray(w2f, DT), blk)

    opt1 = make_ffc_opt('model.5.conv1')
    opt2 = make_ffc_opt('model.5.conv2')

    def ffc_opt(xl, xg, o):
        (wl_fused, wg2l, tl, tg, w1f, t1f, w2f, blk) = o
        mixed = conv3(xl, wl_fused)             # (1,H,W,512) f32
        g2l = conv3(xg, wg2l)
        out_l = jax.nn.relu(mixed[..., :CL] + g2l + tl).astype(DT)
        hh = jax.nn.relu(conv1x1(xg, w1f) + t1f).astype(DT)
        fu = fu_v1(hh, blk)
        spec = conv1x1(hh + fu, w2f)
        out_g = jax.nn.relu(mixed[..., CL:] + spec + tg).astype(DT)
        return out_l, out_g

    def block_opt(xl, xg):
        a, b = ffc_opt(xl, xg, opt1)
        a, b = ffc_opt(a, b, opt2)
        return xl + a, xg + b

    # correctness vs baseline block
    r0 = jax.jit(lambda a, b: _resnet_block(bp, a, b))(xl, xg)
    r1 = jax.jit(block_opt)(xl, xg)
    for i in (0, 1):
        err = float(jnp.max(jnp.abs(r0[i].astype(jnp.float32)
                                    - r1[i].astype(jnp.float32))))
        print(f'block opt out[{i}] max abs err: {err:.5f}')

    tb1 = timed(lambda a, b: sum(o.astype(jnp.float32).sum()
                                 for o in block_opt(a, b)), xl, xg)
    print(f'resnet block opt: {tb1*1e3:.3f} ms  '
          f'({tb0/max(tb1,1e-9):.2f}x)')

    # ---- raw conv costs for reference ----
    for name, ci, co in (('l2l 128->128', CL, CL), ('l2g 128->384', CL, CG),
                         ('g2l 384->128', CG, CL),
                         ('fused 128->512', CL, CL + CG)):
        wt = jnp.asarray(rs.rand(3, 3, ci, co).astype(np.float32) * 0.05, DT)
        xi = jnp.asarray(rs.rand(1, H, W, ci).astype(np.float32), DT)
        tt = timed(lambda x, w=wt: conv3(x, w).sum(), xi)
        gf = H * W * 9 * ci * co * 2 / 1e9
        print(f'conv3 {name}: {tt*1e3:.3f} ms  ({gf/max(tt,1e-9)/1000:.1f} '
              f'TF/s)')


if __name__ == '__main__':
    main()
