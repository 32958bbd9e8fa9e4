"""Decompose the 48px OCR ConvNeXt backbone cost on TPU (32-crop chunk)."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import ocr48
from manga_image_translator_tpu.models.functional import P, gelu, relu

N, W = 32, 256
REPS = 8


def timed(fn, *args, n=6):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(fn(*args))
        ts.append(time.perf_counter() - t0)

    @jax.jit
    def tiny(x):
        return x.sum()
    z = jnp.zeros((8, 128), jnp.float32)
    fs = [0.0] * 5
    for i in range(5):
        t0 = time.perf_counter(); float(tiny(z))
        fs[i] = time.perf_counter() - t0
    return max(min(ts) - min(fs), 0.0)


def loop(fn, label, x):
    @jax.jit
    def looped(x):
        def body(i, carry):
            a, s = carry
            out = fn(a)
            return (a + (s * 0).astype(a.dtype),
                    s + out.astype(jnp.float32).sum())
        _, s = jax.lax.fori_loop(0, REPS, body, (x, jnp.float32(0)))
        return s
    t = timed(looped, x) / REPS
    print(f'{label}: {t*1e3:.2f} ms')
    return t


def main():
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in ocr48.init_params(dict_size=7935).items()}
    p = P(params).scope('backbone')
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N, 48, W, 3).astype(np.float32) * 2 - 1,
                    jnp.bfloat16)

    loop(lambda im: ocr48.convnext_features(p, im), 'full backbone', x)

    # stages
    def stem_only(im):
        s = p.scope('stem')
        y = s.conv('0', im, padding=3)
        y = s.bn('1', y)
        y = relu(y)
        y = ocr48._conv_bn_relu(s, 3, y, 2)
        y = s.conv('6', y, padding=1)
        y = s.bn('7', y)
        return relu(y)
    loop(stem_only, 'stem', x)

    x1 = stem_only(x)

    def blocks1(y):
        for i in range(4):
            y = ocr48._convnext_block(p.scope(f'block1.{i}'), y, 7)
        return y
    loop(blocks1, 'block1 x4 (dim 80, ks 7)', x1)

    # isolate depthwise vs pointwise at block2 dims
    x2 = ocr48._conv_bn_relu(p.scope('down1'), 0, blocks1(x1), 2)

    def blocks2(y):
        for i in range(12):
            y = ocr48._convnext_block(p.scope(f'block2.{i}'), y, 7)
        return y
    loop(blocks2, 'block2 x12 (dim 160, ks 7)', x2)

    bp = p.scope('block2.0')

    def dw_only(y):
        return bp.conv('dwconv', y, padding=3, groups=y.shape[-1])
    loop(dw_only, 'one dwconv 7x7 dim160', x2)

    def pw_only(y):
        return bp.conv('pwconv2', gelu(bp.conv('pwconv1', y)))
    loop(pw_only, 'one pw pair 160->640->160', x2)


if __name__ == '__main__':
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == 'full':
        main()


def main2():
    """Channel-pad block1 (dim 80 -> 128) and re-measure."""
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in ocr48.init_params(dict_size=7935).items()}
    p = P(params).scope('backbone')
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N, 48, W, 3).astype(np.float32) * 2 - 1,
                    jnp.bfloat16)

    def stem_only(im):
        s = p.scope('stem')
        y = s.conv('0', im, padding=3)
        y = s.bn('1', y)
        y = relu(y)
        y = ocr48._conv_bn_relu(s, 3, y, 2)
        y = s.conv('6', y, padding=1)
        y = s.bn('7', y)
        return relu(y)

    x1 = stem_only(x)
    CP = 128

    def padded_block(scope, y, ks):
        # y: (N, H, W, 128) zero-padded channels; weights padded on the fly
        dim = 80
        dw = scope['dwconv.weight']                       # (7,7,1,80)
        dwp = jnp.pad(dw, ((0, 0), (0, 0), (0, 0), (0, CP - dim)))
        inp = y
        z = jax.lax.conv_general_dilated(
            y, dwp.astype(y.dtype), (1, 1),
            [(ks // 2, ks // 2)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=CP,
            preferred_element_type=jnp.float32).astype(y.dtype)
        z = z + jnp.pad(scope['dwconv.bias'], (0, CP - dim)).astype(y.dtype)
        # bn with pad scale 0
        mean = jnp.pad(scope['norm.running_mean'], (0, CP - dim))
        var = jnp.pad(scope['norm.running_var'], (0, CP - dim),
                      constant_values=1.0)
        bw = jnp.pad(scope['norm.weight'], (0, CP - dim))
        bb = jnp.pad(scope['norm.bias'], (0, CP - dim))
        sc = (bw / jnp.sqrt(var + 1e-6)).astype(y.dtype)
        sh = (bb - mean * bw / jnp.sqrt(var + 1e-6)).astype(y.dtype)
        z = z * sc + sh
        w1 = jnp.pad(scope['pwconv1.weight'], ((0, 0), (0, 0),
                                               (0, CP - dim), (0, 0)))
        z = jax.lax.conv_general_dilated(
            z, w1.astype(y.dtype), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(y.dtype)
        z = z + scope['pwconv1.bias'].astype(y.dtype)
        z = gelu(z)
        w2 = jnp.pad(scope['pwconv2.weight'], ((0, 0), (0, 0),
                                               (0, 0), (0, CP - dim)))
        z = jax.lax.conv_general_dilated(
            z, w2.astype(y.dtype), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(y.dtype)
        z = z + jnp.pad(scope['pwconv2.bias'], (0, CP - dim)).astype(y.dtype)
        g = jnp.pad(scope['gamma'].reshape(-1), (0, CP - dim))
        return inp + z * g.astype(y.dtype)

    def blocks1_padded(y):
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, CP - 80)))
        for i in range(4):
            y = padded_block(p.scope(f'block1.{i}'), y, 7)
        return y[..., :80]
    loop(blocks1_padded, 'block1 x4 PADDED to 128ch', x1)


if __name__ == '__main__':
    main2()
