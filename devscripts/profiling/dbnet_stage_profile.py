"""DBNet-R34 stage decomposition on TPU @1536 (batch 4, bf16)."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import dbnet
from manga_image_translator_tpu.models.functional import P, relu

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
    print(f'{label}: {t*1e3:.2f} ms (batch {N})')
    return t


def main():
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in dbnet.init_params(jax.random.PRNGKey(0)).items()}
    p = P(params)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N, S, S, 3).astype(np.float32) * 2 - 1,
                    jnp.bfloat16)

    loop(lambda im: dbnet_full(params, im), 'full dbnet fwd', x)

    bp = p.scope('backbone')

    def stem(im):
        y = bp.conv('conv1', im, stride=2, padding=3)
        y = bp.bn('bn1', y)
        return relu(y)
    loop(stem, 'stem 7x7s2 3->64 @1536', x)


def dbnet_full(params, im):
    db, mask = dbnet.dbnet_forward(params, im)
    return db, mask


if __name__ == '__main__':
    main()
