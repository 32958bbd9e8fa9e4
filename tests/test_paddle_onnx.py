"""ONNX-lite parser + paddle weight-mapping round trip.

Builds a synthetic PaddleOCR-det-shaped ONNX model byte-for-byte with a
minimal protobuf wire encoder, parses it with utils/onnx_lite, maps it with
detection/paddle_onnx, and checks the produced params run the JAX forward
and match init_params' key/shape layout. This validates the whole offline
conversion chain without the onnx package or network access.
"""
import struct

import numpy as np
import pytest


# ---------------------------------------------------------------- encoder
def _varint(v: int) -> bytes:
    out = b''
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _ld(num: int, data: bytes) -> bytes:
    return _field(num, 2, _varint(len(data)) + data)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    out = b''
    for d in arr.shape:
        out += _field(1, 0, _varint(d))
    out += _field(2, 0, _varint(1))                   # float32
    out += _ld(8, name.encode())
    out += _ld(9, arr.astype(np.float32).tobytes())
    return out


def _node(op: str, name: str, inputs, outputs) -> bytes:
    out = b''
    for i in inputs:
        out += _ld(1, i.encode())
    for o in outputs:
        out += _ld(2, o.encode())
    out += _ld(3, name.encode())
    out += _ld(4, op.encode())
    return out


def _value_info(name: str) -> bytes:
    return _ld(1, name.encode())


def build_paddle_like_onnx(rs, fold_bn=False, skip_thresh=False):
    """Synthesize an ONNX model whose conv/BN sequence mirrors the PP-OCR
    det export: convs in forward order (with the p-convs exported p2..p5 —
    the REVERSE of our forward order — to exercise connectivity
    disambiguation)."""
    from manga_image_translator_tpu.detection.paddle_onnx import \
        _slot_manifest
    slots = _slot_manifest()
    by_key = {s['key']: s for s in slots}

    nodes = []
    inits = {}
    tensor_of = {}           # slot key -> output tensor name
    counter = [0]

    def add_conv(slot, input_tensor):
        key = slot['key']
        o, i, kh, kw = slot['oihw']
        shape = (i, o, kh, kw) if slot['kind'] == 'conv_t' else slot['oihw']
        wname = f'{key}.w'
        inits[wname] = rs.randn(*shape).astype(np.float32) * 0.1
        bname = f'{key}.b'
        inits[bname] = rs.randn(o).astype(np.float32) * 0.1
        out = f't{counter[0]}'
        counter[0] += 1
        op = 'ConvTranspose' if slot['kind'] == 'conv_t' else 'Conv'
        nodes.append((op, key, [input_tensor, wname, bname], [out]))
        if slot['bn'] and not fold_bn:
            for suffix, init in (('scale', np.abs(rs.randn(o)) + .5),
                                 ('bias', rs.randn(o)),
                                 ('mean', rs.randn(o) * .1),
                                 ('var', np.abs(rs.randn(o)) + .5)):
                inits[f'{key}.bn.{suffix}'] = init.astype(np.float32)
            bn_out = f't{counter[0]}'
            counter[0] += 1
            nodes.append(('BatchNormalization', f'{key}.bn',
                          [out, f'{key}.bn.scale', f'{key}.bn.bias',
                           f'{key}.bn.mean', f'{key}.bn.var'], [bn_out]))
            out = bn_out
        act = f't{counter[0]}'
        counter[0] += 1
        nodes.append(('Relu', f'{key}.act', [out], [act]))
        tensor_of[key] = act
        return act

    x = 'input'
    for s in slots:
        if s['key'].startswith('backbone.'):
            x = add_conv(s, x)

    # laterals consumed from distinct backbone tensors (connectivity only
    # matters for the p-convs; feeding from x keeps it simple)
    for name in ('in2', 'in3', 'in4', 'in5'):
        add_conv(by_key[f'neck.{name}'], x)
    # fpn top-down adds + p-convs exported in p2..p5 order
    prev = tensor_of['neck.in5']
    outs = {'in5': tensor_of['neck.in5']}
    for name in ('in4', 'in3', 'in2'):
        rs_out = f't{counter[0]}'
        counter[0] += 1
        nodes.append(('Resize', f'resize.{name}', [prev], [rs_out]))
        add_out = f't{counter[0]}'
        counter[0] += 1
        nodes.append(('Add', f'add.{name}', [tensor_of[f'neck.{name}'],
                                             rs_out], [add_out]))
        outs[name] = add_out
        prev = add_out
    for name in ('p2', 'p3', 'p4', 'p5'):
        slot = dict(by_key[f'neck.{name}'])
        add_conv(slot, outs[f'in{name[1]}'])

    concat_out = f't{counter[0]}'
    counter[0] += 1
    nodes.append(('Concat', 'fpn.concat',
                  [tensor_of[f'neck.p{i}'] for i in (5, 4, 3, 2)],
                  [concat_out]))

    heads = ('binarize',) if skip_thresh else ('binarize', 'thresh')
    g_outputs = []
    for head in heads:
        x = concat_out
        for cname in ('conv1', 'conv2', 'conv3'):
            x = add_conv(by_key[f'head.{head}.{cname}'], x)
        sig = f'{head}.sigmoid'
        nodes.append(('Sigmoid', sig, [x], [sig]))
        g_outputs.append(sig)

    graph = b''
    for op, name, ins, outs_ in nodes:
        graph += _ld(1, _node(op, name, ins, outs_))
    for name, arr in inits.items():
        graph += _ld(5, _tensor(name, arr))
    graph += _ld(11, _value_info('input'))
    for o in g_outputs:
        graph += _ld(12, _value_info(o))
    return _ld(7, graph), inits


def test_onnx_lite_roundtrip():
    from manga_image_translator_tpu.utils import onnx_lite
    rs = np.random.RandomState(0)
    model, inits = build_paddle_like_onnx(rs)
    g = onnx_lite.parse_model(model)
    assert len(g.initializers) == len(inits)
    for k, v in inits.items():
        assert g.initializers[k].shape == v.shape
        np.testing.assert_array_equal(g.initializers[k], v)
    assert any(n.op_type == 'Conv' for n in g.nodes)
    assert g.inputs == ['input']


@pytest.mark.parametrize('fold_bn,skip_thresh', [(False, False),
                                                 (True, False),
                                                 (False, True)])
def test_paddle_mapping(fold_bn, skip_thresh):
    from manga_image_translator_tpu.detection.paddle_onnx import convert_graph
    from manga_image_translator_tpu.models import paddle_det
    from manga_image_translator_tpu.utils import onnx_lite
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    model, _ = build_paddle_like_onnx(rs, fold_bn=fold_bn,
                                      skip_thresh=skip_thresh)
    g = onnx_lite.parse_model(model)
    np_params = convert_graph(g)

    expected = paddle_det.init_params()
    missing = set(expected) - set(np_params)
    # mapped params may add conv biases where init has none; that's fine,
    # but every expected key must exist with the right shape
    assert not missing, f'missing converted params: {sorted(missing)[:8]}'
    for k in expected:
        assert tuple(np_params[k].shape) == tuple(expected[k].shape), \
            f'{k}: {np_params[k].shape} != {expected[k].shape}'

    # p-convs must land on the right laterals despite reversed export order:
    # re-derive the source weights and compare
    for name in ('p2', 'p3', 'p4', 'p5'):
        w = np_params[f'neck.{name}.weight']
        src = g.initializers[f'neck.{name}.w'].transpose(2, 3, 1, 0)
        np.testing.assert_allclose(np.asarray(w), src)

    # forward runs
    params = {k: jnp.asarray(v) for k, v in np_params.items()}
    out = paddle_det.paddle_det_forward(
        params, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out.shape == (1, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
