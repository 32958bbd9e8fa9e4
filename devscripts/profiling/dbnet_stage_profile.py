"""DBNet-R34 stage decomposition on TPU @1536 (batch 4, bf16).

Where do the ~13 ms/page go?  Candidate hotspots: the low-channel (64ch)
high-resolution convs in upconv6/7 + mask head (MXU half-empty at 64
lanes), the stem 7x7 at 768², and layer1 (64ch @384²).
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import dbnet
from manga_image_translator_tpu.models.dbnet import (
    _basic_block, _double_conv, _double_conv_up, _db_head, _mask_head,
    _RESNET34_STAGES)
from manga_image_translator_tpu.models.functional import P, relu, max_pool2d

N, S = 4, 1536
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
    fs = []
    for _ in range(5):
        t0 = time.perf_counter(); float(tiny(z))
        fs.append(time.perf_counter() - t0)
    return max(min(ts) - min(fs), 0.0)


def loop(fn, label, *xs):
    @jax.jit
    def looped(*a):
        def body(i, s):
            bumped = jax.tree.map(lambda x: x + (s * 0).astype(x.dtype), a)
            out = fn(*bumped)
            return s + jax.tree.reduce(
                lambda acc, o: acc + o.astype(jnp.float32).sum(),
                out, jnp.float32(0))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    t = timed(looped, *xs) / REPS
    print(f'{label}: {t*1e3:.2f} ms (batch {N})', flush=True)
    return t


def main():
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in dbnet.init_params(jax.random.PRNGKey(0)).items()}
    p = P(params)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N, S, S, 3).astype(np.float32) * 2 - 1,
                    jnp.bfloat16)

    loop(lambda im: dbnet.dbnet_forward(params, im), 'full dbnet fwd', x)

    bp = p.scope('backbone')

    def stem(im):
        y = bp.conv('conv1', im, stride=2, padding=3)
        y = bp.bn('bn1', y)
        return max_pool2d(relu(y), 3, 2, 1)
    loop(stem, 'stem 7x7s2 + pool -> 384p 64ch', x)

    # per-resnet-stage inputs
    res = {1: 384, 2: 384, 3: 192, 4: 96}
    cin = {1: 64, 2: 64, 3: 128, 4: 256}
    feats = {}
    for li, (blocks, ch) in enumerate(_RESNET34_STAGES, start=1):
        h = jnp.asarray(rs.rand(N, res[li], res[li], cin[li]
                                ).astype(np.float32), jnp.bfloat16)

        def stage(v, _li=li, _blocks=blocks):
            for bi in range(_blocks):
                stride = 2 if (_li > 1 and bi == 0) else 1
                v = _basic_block(bp.scope(f'layer{_li}.{bi}'), v, stride)
            return v
        loop(stage, f'layer{li} ({blocks}x{ch}ch)', h)

    h32 = jnp.asarray(rs.rand(N, 48, 48, 512).astype(np.float32),
                      jnp.bfloat16)

    def downs(v):
        a = _double_conv(p.scope('down_conv1'), v, down=True)
        b = _double_conv(p.scope('down_conv2'), a, down=True)
        c = _double_conv(p.scope('down_conv3'), b, down=True)
        return a, b, c
    loop(downs, 'downs 48->6p 512ch', h32)

    # upconv chain pieces (feed random tensors of the right shapes)
    up_shapes = [  # (name, in_res, in_ch)
        ('upconv1', 6, 512), ('upconv2', 12, 768), ('upconv3', 24, 768),
        ('upconv4', 48, 768), ('upconv5', 96, 512), ('upconv6', 192, 256),
        ('upconv7', 384, 128)]
    for name, r, c in up_shapes:
        h = jnp.asarray(rs.rand(N, r, r, c).astype(np.float32), jnp.bfloat16)
        loop(lambda v, _n=name: _double_conv_up(p.scope(_n), v),
             f'{name} @{r}p {c}ch', h)

    up8 = jnp.asarray(rs.rand(N, 192, 192, 64).astype(np.float32),
                      jnp.bfloat16)
    loop(lambda v: _db_head(p.scope('conv_db'), v), 'db head @192p', up8)
    up4 = jnp.asarray(rs.rand(N, 384, 384, 64).astype(np.float32),
                      jnp.bfloat16)
    loop(lambda v: _mask_head(p.scope('conv_mask'), v), 'mask head @384p',
         up4)


if __name__ == '__main__':
    main()
