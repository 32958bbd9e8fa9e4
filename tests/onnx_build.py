"""Tiny ONNX protobuf WRITER for test fixtures (inverse of
utils/onnx_lite's reader). Only the fields the reader understands are
emitted; enough to synthesize models exercising utils/onnx_eval without
the ``onnx`` package."""
from __future__ import annotations

import struct
from typing import Dict, List, Sequence

import numpy as np

_NP_TO_ONNX = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.int32): 6, np.dtype(np.int64): 7, np.dtype(np.bool_): 9,
    np.dtype(np.float64): 11,
}


def _varint(v: int) -> bytes:
    out = bytearray()
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _vint(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _f32(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack('<f', v)


def tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b''
    for d in arr.shape:
        out += _vint(1, d)
    out += _vint(2, _NP_TO_ONNX[arr.dtype])
    out += _ld(8, name.encode())
    out += _ld(9, np.ascontiguousarray(arr).tobytes())
    return out


def attribute(name: str, value) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, np.ndarray):
        out += _ld(5, tensor('', value)) + _vint(20, 4)      # TENSOR
    elif isinstance(value, float):
        out += _f32(2, value) + _vint(20, 1)                 # FLOAT
    elif isinstance(value, bool) or isinstance(value, int):
        out += _vint(3, int(value)) + _vint(20, 2)           # INT
    elif isinstance(value, str):
        out += _ld(4, value.encode()) + _vint(20, 3)         # STRING
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            payload = b''.join(struct.pack('<f', v) for v in value)
            out += _ld(7, payload) + _vint(20, 6)            # FLOATS
        else:
            payload = b''.join(_varint(int(v)) for v in value)
            out += _ld(8, payload) + _vint(20, 7)            # INTS
    else:
        raise TypeError(type(value))
    return out


def node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
         name: str = '', **attrs) -> bytes:
    out = b''
    for i in inputs:
        out += _ld(1, i.encode())
    for o in outputs:
        out += _ld(2, o.encode())
    out += _ld(3, (name or op_type).encode())
    out += _ld(4, op_type.encode())
    for k, v in attrs.items():
        out += _ld(5, attribute(k, v))
    return out


def model(nodes: List[bytes], initializers: Dict[str, np.ndarray],
          inputs: Sequence[str], outputs: Sequence[str]) -> bytes:
    g = b''
    for n in nodes:
        g += _ld(1, n)
    for nm, arr in initializers.items():
        g += _ld(5, tensor(nm, arr))
    for nm in inputs:
        g += _ld(11, _ld(1, nm.encode()))
    for nm in outputs:
        g += _ld(12, _ld(1, nm.encode()))
    return _ld(7, g)
