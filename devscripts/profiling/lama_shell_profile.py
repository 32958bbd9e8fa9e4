"""Decompose the LaMa 'shell' cost (stem + downsamples + upsamples) at
1536px — everything except the 18 resnet blocks. Difference-method timing."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.expanduser('~'), '.cache',
                               'mit-tpu-jax-bench-cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from manga_image_translator_tpu.models import lama
from manga_image_translator_tpu.models.lama import P, _ffc_bn_act, relu

PAGE = 1536

def timed(fn, *args, n=8):
    for _ in range(3):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n

def diff_bench(fn_factory, x0, label, n1=2, n2=8):
    t1 = timed(fn_factory(n1), x0)
    t2 = timed(fn_factory(n2), x0)
    t = (t2 - t1) / (n2 - n1)
    print(f'{label}: {t*1000:.2f} ms')
    return t

params = lama.init_params(n_blocks=18, dtype=jnp.bfloat16)
rs = np.random.RandomState(0)
img = jnp.asarray(rs.rand(1, PAGE, PAGE, 4).astype(np.float32), jnp.bfloat16)
p = P(params)

def make_stage(stage_fn):
    # x0 must be an ARGUMENT: closure-captured arrays become constants
    # serialized into the remote-compile request (HTTP 413 past ~100MB)
    def factory(reps):
        @jax.jit
        def run(x0):
            def body(i, carry):
                x, s = carry
                y = stage_fn(x + (s * 0).astype(x.dtype))
                return x, s + y.astype(jnp.float32).sum()
            _, s = jax.lax.fori_loop(0, reps, body, (x0, jnp.float32(0)))
            return s
        return run
    return factory

# stem: reflect pad 3 + 7x7 conv 4->64 + bn + relu at 1536^2
def stem(x):
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')
    a, _ = _ffc_bn_act(p.scope('model.1'), x, None, 0, 0, padding=0)
    return a
diff_bench(make_stage(stem), img, 'stem 7x7 4->64 @1536 (reflect pad)')

x64 = jnp.asarray(rs.rand(1, PAGE, PAGE, 64).astype(np.float32),
                  jnp.bfloat16)
def down1(x):
    a, _ = _ffc_bn_act(p.scope('model.2'), x, None, 0, 0, stride=2,
                       padding=1)
    return a
diff_bench(make_stage(down1), x64, 'down1 3x3 s2 64->128 @1536')

x128 = jnp.asarray(rs.rand(1, PAGE // 2, PAGE // 2, 128).astype(np.float32),
                   jnp.bfloat16)
def down2(x):
    a, _ = _ffc_bn_act(p.scope('model.3'), x, None, 0, 0, stride=2,
                       padding=1)
    return a
diff_bench(make_stage(down2), x128, 'down2 3x3 s2 128->256 @768')

x256 = jnp.asarray(rs.rand(1, PAGE // 4, PAGE // 4, 256).astype(np.float32),
                   jnp.bfloat16)
def down3(x):
    a, b = _ffc_bn_act(p.scope('model.4'), x, None, 0, 0.75, stride=2,
                       padding=1)
    return jnp.concatenate([a, b], axis=-1)
diff_bench(make_stage(down3), x256, 'down3 3x3 s2 256->512 @384')

# up path: 3 transposed convs + final 7x7
x512 = jnp.asarray(rs.rand(1, PAGE // 8, PAGE // 8, 512).astype(np.float32),
                   jnp.bfloat16)
def up_path(x):
    up0 = 5 + 18 + 1
    for i in range(3):
        base = up0 + i * 3
        x = p.conv_t(f'model.{base}', x, stride=2, padding=1, kernel_size=3,
                     output_padding=1)
        x = relu(p.bn(f'model.{base + 1}', x))
    return x
diff_bench(make_stage(up_path), x512, 'up path 3 convT @192->1536', n1=1, n2=4)

x64f = jnp.asarray(rs.rand(1, PAGE, PAGE, 64).astype(np.float32),
                   jnp.bfloat16)
def final(x):
    up0 = 5 + 18 + 1
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode='reflect')
    return p.conv(f'model.{up0 + 9 + 1}', x)
diff_bench(make_stage(final), x64f, 'final 7x7 64->3 @1536 (reflect pad)')
