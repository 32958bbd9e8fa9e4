"""utils/onnx_eval: jittable ONNX graph evaluation, verified against
numpy/torch on synthetic models built with tests/onnx_build (no ``onnx``
package in this image)."""
import numpy as np
import pytest

import jax.numpy as jnp

import onnx_build as ob
from manga_image_translator_tpu.utils import onnx_eval, onnx_lite


def _graph(nodes, inits, inputs, outputs):
    return onnx_lite.parse_model(ob.model(nodes, inits, inputs, outputs))


def test_attribute_parsing_roundtrip():
    n = ob.node('Conv', ['x', 'w'], ['y'], strides=[2, 2],
                pads=[1, 1, 1, 1], group=2, alpha=0.5, mode='reflect')
    g = _graph([n], {}, ['x'], ['y'])
    attrs = g.nodes[0].attrs
    assert attrs['strides'] == [2, 2]
    assert attrs['pads'] == [1, 1, 1, 1]
    assert attrs['group'] == 2
    assert abs(attrs['alpha'] - 0.5) < 1e-7
    assert attrs['mode'] == 'reflect'


def test_conv_bn_relu_pool_vs_torch():
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 16, 16).astype(np.float32)
    w = rs.randn(8, 3, 3, 3).astype(np.float32) * 0.2
    b = rs.randn(8).astype(np.float32)
    scale = rs.rand(8).astype(np.float32) + 0.5
    bias = rs.randn(8).astype(np.float32)
    mean = rs.randn(8).astype(np.float32)
    var = rs.rand(8).astype(np.float32) + 0.5

    nodes = [
        ob.node('Conv', ['x', 'w', 'b'], ['c'], strides=[2, 2],
                pads=[1, 1, 1, 1]),
        ob.node('BatchNormalization',
                ['c', 'scale', 'bias', 'mean', 'var'], ['n']),
        ob.node('Relu', ['n'], ['r']),
        ob.node('MaxPool', ['r'], ['p'], kernel_shape=[2, 2],
                strides=[2, 2]),
        ob.node('GlobalAveragePool', ['p'], ['g']),
        ob.node('Flatten', ['g'], ['y']),
    ]
    g = _graph(nodes, {'w': w, 'b': b, 'scale': scale, 'bias': bias,
                       'mean': mean, 'var': var}, ['x'], ['y'])

    got = np.asarray(onnx_eval.make_runner(g)(jnp.asarray(x)))

    with torch.no_grad():
        t = torch.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                         torch.from_numpy(b), stride=2, padding=1)
        t = torch.nn.functional.batch_norm(
            t, torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
        t = torch.relu(t)
        t = torch.nn.functional.max_pool2d(t, 2, 2)
        ref = t.mean(dim=(2, 3)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_grouped_conv_and_avgpool_vs_torch():
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(1)
    x = rs.randn(1, 4, 8, 8).astype(np.float32)
    w = rs.randn(4, 2, 3, 3).astype(np.float32)
    nodes = [
        ob.node('Conv', ['x', 'w'], ['c'], pads=[1, 1, 1, 1], group=2),
        ob.node('AveragePool', ['c'], ['y'], kernel_shape=[2, 2],
                strides=[2, 2]),
    ]
    g = _graph(nodes, {'w': w}, ['x'], ['y'])
    got = np.asarray(onnx_eval.make_runner(g)(jnp.asarray(x)))
    with torch.no_grad():
        ref = torch.nn.functional.avg_pool2d(
            torch.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                         padding=1, groups=2), 2, 2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_shape_flow_constant_folds_under_jit():
    """Shape -> Gather -> Concat -> Reshape (the standard torch export
    pattern) must fold to static shapes so the whole graph jits."""
    rs = np.random.RandomState(2)
    x = rs.randn(2, 3, 4).astype(np.float32)
    nodes = [
        ob.node('Shape', ['x'], ['s']),
        ob.node('Gather', ['s', 'i0'], ['d0'], axis=0),
        ob.node('Unsqueeze', ['d0'], ['d0u'], axes=[0]),
        ob.node('Concat', ['d0u', 'negone'], ['tgt'], axis=0),
        ob.node('Reshape', ['x', 'tgt'], ['y']),
    ]
    g = _graph(nodes, {'i0': np.array(0, np.int64),
                       'negone': np.array([-1], np.int64)}, ['x'], ['y'])
    got = np.asarray(onnx_eval.make_runner(g)(jnp.asarray(x)))
    np.testing.assert_allclose(got, x.reshape(2, -1))


def test_attention_block_vs_numpy():
    """MatMul/Transpose/Softmax/LayerNormalization/Gemm — the transformer
    op set the wd-swinv2 tagger graph is built from."""
    rs = np.random.RandomState(3)
    x = rs.randn(2, 5, 8).astype(np.float32)
    wq = rs.randn(8, 8).astype(np.float32)
    wv = rs.randn(8, 8).astype(np.float32)
    ln_s = rs.rand(8).astype(np.float32) + 0.5
    ln_b = rs.randn(8).astype(np.float32)

    nodes = [
        ob.node('LayerNormalization', ['x', 'ln_s', 'ln_b'], ['n'],
                axis=-1, epsilon=1e-5),
        ob.node('MatMul', ['n', 'wq'], ['q']),
        ob.node('MatMul', ['n', 'wv'], ['v']),
        ob.node('Transpose', ['q'], ['qt'], perm=[0, 2, 1]),
        ob.node('MatMul', ['n', 'qt'], ['scores']),
        ob.node('Softmax', ['scores'], ['attn'], axis=-1),
        ob.node('MatMul', ['attn', 'v'], ['y']),
    ]
    g = _graph(nodes, {'wq': wq, 'wv': wv, 'ln_s': ln_s, 'ln_b': ln_b},
               ['x'], ['y'])
    got = np.asarray(onnx_eval.make_runner(g)(jnp.asarray(x)))

    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    n = (x - mean) / np.sqrt(var + 1e-5) * ln_s + ln_b
    q = n @ wq
    v = n @ wv
    scores = n @ q.transpose(0, 2, 1)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ref = attn @ v
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_slice_pad_resize_concat_split():
    rs = np.random.RandomState(4)
    x = rs.randn(1, 2, 6, 6).astype(np.float32)
    nodes = [
        ob.node('Slice', ['x', 'st', 'en', 'ax', 'sp'], ['sl']),
        ob.node('Pad', ['sl', 'pads'], ['pd'], mode='constant'),
        ob.node('Resize', ['pd', '', 'scales'], ['rs'], mode='nearest'),
        ob.node('Split', ['rs'], ['a', 'b'], axis=1),
        ob.node('Concat', ['b', 'a'], ['y'], axis=1),
    ]
    g = _graph(nodes, {
        'st': np.array([1], np.int64), 'en': np.array([5], np.int64),
        'ax': np.array([2], np.int64), 'sp': np.array([1], np.int64),
        'pads': np.array([0, 0, 1, 0, 0, 0, 1, 0], np.int64),
        'scales': np.array([1, 1, 2, 2], np.float32),
    }, ['x'], ['y'])
    got = np.asarray(onnx_eval.make_runner(g)(jnp.asarray(x)))

    sl = x[:, :, 1:5, :]
    pd = np.pad(sl, ((0, 0), (0, 0), (1, 1), (0, 0)))
    rz = pd.repeat(2, axis=2).repeat(2, axis=3)
    a, b = rz[:, :1], rz[:, 1:]
    ref = np.concatenate([b, a], axis=1)
    np.testing.assert_allclose(got, ref)


def test_gemm_gelu_sigmoid_head():
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(5)
    x = rs.randn(2, 16).astype(np.float32)
    w = rs.randn(4, 16).astype(np.float32)
    b = rs.randn(4).astype(np.float32)
    nodes = [
        ob.node('Gemm', ['x', 'w', 'b'], ['h'], transB=1),
        ob.node('Gelu', ['h'], ['g']),
        ob.node('Sigmoid', ['g'], ['y']),
    ]
    g = _graph(nodes, {'w': w, 'b': b}, ['x'], ['y'])
    got = np.asarray(onnx_eval.make_runner(g)(jnp.asarray(x)))
    with torch.no_grad():
        ref = torch.sigmoid(torch.nn.functional.gelu(
            torch.from_numpy(x) @ torch.from_numpy(w).T
            + torch.from_numpy(b))).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_unsupported_op_raises():
    g = _graph([ob.node('NonMaxSuppression', ['x'], ['y'])], {}, ['x'],
               ['y'])
    with pytest.raises(NotImplementedError, match='NonMaxSuppression'):
        onnx_eval.evaluate(g, {'x': jnp.zeros((1,))})


def test_booru_tagger_end_to_end(tmp_path):
    """Tagger over a synthetic mini-ONNX classifier: preprocessing
    (square-pad + resize), jitted graph run, csv tag naming, rating-row
    exclusion and thresholding (reference booru_tagger.py:40-102)."""
    from manga_image_translator_tpu.inpainting.booru_tagger import Tagger

    rs = np.random.RandomState(6)
    size, n_tags = 32, 9
    # input (1, H, W, 3) NHWC like wd-swinv2; tiny conv + head
    w = rs.randn(4, 3, 3, 3).astype(np.float32) * 0.1
    wf = rs.randn(n_tags, 4).astype(np.float32)
    bf = rs.randn(n_tags).astype(np.float32)
    nodes = [
        ob.node('Transpose', ['x'], ['xc'], perm=[0, 3, 1, 2]),
        ob.node('Conv', ['xc', 'w'], ['c'], pads=[1, 1, 1, 1]),
        ob.node('GlobalAveragePool', ['c'], ['g']),
        ob.node('Flatten', ['g'], ['f']),
        ob.node('Gemm', ['f', 'wf', 'bf'], ['h'], transB=1),
        ob.node('Sigmoid', ['h'], ['y']),
    ]
    (tmp_path / 'model.onnx').write_bytes(
        ob.model(nodes, {'w': w, 'wf': wf, 'bf': bf}, ['x'], ['y']))
    names = ['general', 'sensitive', 'questionable', 'explicit',
             'sky', 'smile', '1girl', 'long_hair', 'catgirl']
    csv_text = 'tag_id,name,category,count\n' + '\n'.join(
        f'{i},{n},0,10' for i, n in enumerate(names))
    (tmp_path / 'selected_tags.csv').write_text(csv_text)

    tagger = Tagger(tmp_path / 'model.onnx',
                    tmp_path / 'selected_tags.csv', input_size=size)
    img = rs.randint(0, 255, (40, 24, 3)).astype(np.uint8)   # non-square
    tags = tagger.label_cv2_bgr(img, threshold=0.3)

    # reference computation with torch
    torch = pytest.importorskip('torch')
    from manga_image_translator_tpu.inpainting.booru_tagger import (
        make_square, smart_resize)
    x = smart_resize(make_square(img, size), size).astype(np.float32)
    with torch.no_grad():
        t = torch.conv2d(torch.from_numpy(x[None].transpose(0, 3, 1, 2)),
                         torch.from_numpy(w), padding=1)
        logits = t.mean(dim=(2, 3)) @ torch.from_numpy(wf).T \
            + torch.from_numpy(bf)
        conf = torch.sigmoid(logits).numpy().reshape(-1)
    expected = {n: float(c) for n, c in zip(names[4:], conf[4:])
                if c > 0.3}
    assert set(tags) == set(expected)
    for k in tags:
        assert abs(tags[k] - expected[k]) < 1e-4
    # rating rows never appear even when confident
    assert not set(tags) & {'general', 'sensitive', 'questionable',
                            'explicit'}
