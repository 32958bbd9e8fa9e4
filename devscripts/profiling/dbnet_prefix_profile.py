"""DBNet cumulative-prefix timing @1536 batch 4 (bf16).

The isolated-stage decomposition (dbnet_stage_profile) sums to ~41 ms vs
55 ms for the full forward — isolated pieces fuse differently than the
wired graph. Prefixes of the REAL graph localize the gap.
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
    _db_head, _double_conv, _double_conv_up, _mask_head, resnet34_features)
from manga_image_translator_tpu.models.functional import P

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


def prefix(params, upto):
    """Run dbnet_forward but stop after `upto` pieces."""
    def fn(x):
        p = P(params)
        bb = p.scope('backbone')
        h4, h8, h16, h32 = resnet34_features(bb, x)
        if upto == 'backbone':
            return h4, h8, h16, h32
        h64 = _double_conv(p.scope('down_conv1'), h32, down=True)
        h128 = _double_conv(p.scope('down_conv2'), h64, down=True)
        h256 = _double_conv(p.scope('down_conv3'), h128, down=True)
        if upto == 'downs':
            return h4, h8, h16, h256
        up256 = _double_conv_up(p.scope('upconv1'), h256)
        up128 = _double_conv_up(p.scope('upconv2'),
                                jnp.concatenate([up256, h128], axis=-1))
        up64 = _double_conv_up(p.scope('upconv3'),
                               jnp.concatenate([up128, h64], axis=-1))
        up32 = _double_conv_up(p.scope('upconv4'),
                               jnp.concatenate([up64, h32], axis=-1))
        up16 = _double_conv_up(p.scope('upconv5'),
                               jnp.concatenate([up32, h16], axis=-1))
        up8 = _double_conv_up(p.scope('upconv6'),
                              jnp.concatenate([up16, h8], axis=-1))
        if upto == 'up8':
            return up8, h4
        up4 = _double_conv_up(p.scope('upconv7'),
                              jnp.concatenate([up8, h4], axis=-1))
        if upto == 'up4':
            return up8, up4
        db = _db_head(p.scope('conv_db'), up8)
        if upto == 'db':
            return db, up4
        mask = _mask_head(p.scope('conv_mask'), up4)
        return db, mask
    return fn


def main():
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in dbnet.init_params(jax.random.PRNGKey(0)).items()}
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N, S, S, 3).astype(np.float32) * 2 - 1,
                    jnp.bfloat16)
    prev = 0.0
    for upto in ('backbone', 'downs', 'up8', 'up4', 'db', 'full'):
        t = loop(prefix(params, upto), f'prefix {upto}', x)
        print(f'  marginal {upto}: {(t - prev)*1e3:.2f} ms', flush=True)
        prev = t


if __name__ == '__main__':
    main()
