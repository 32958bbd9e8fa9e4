"""Jittable ONNX graph evaluator over ``onnx_lite``'s parsed graphs.

The reference runs its auxiliary ONNX models (wd-swinv2 booru tagger —
``inpainting/booru_tagger.py:40-102``; PaddleOCR det via the Rust ORT
wheel) through onnxruntime. This image has neither ``onnx`` nor
``onnxruntime``; instead the graph interprets into jax ops and jits
end-to-end, so the whole model becomes ONE XLA program on TPU (fused,
bf16-able) rather than an op-by-op CPU walk.

Shape-flow handling: ONNX exports compute shapes *in the graph* (Shape →
Gather → Concat → Reshape). Under ``jit`` those must be static, so the
evaluator constant-folds any node whose inputs are all host numpy values
(initializers, Shape results, Constants) with numpy; only tensor compute
lands in the traced jaxpr. This mirrors what onnxruntime's constant
folding does ahead of time.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .onnx_lite import OnnxGraph, OnnxNode

_CAST_DTYPES = {
    1: jnp.float32, 2: jnp.uint8, 3: jnp.int8, 4: jnp.uint16, 5: jnp.int16,
    6: jnp.int32, 7: jnp.int64, 9: jnp.bool_, 10: jnp.float16,
    11: jnp.float64, 12: jnp.uint32, 13: jnp.uint64,
}


def _is_static(*vals) -> bool:
    return all(v is None or isinstance(v, (np.ndarray, np.generic, int,
                                           float, list, tuple))
               for v in vals)


def _ints(v) -> List[int]:
    return [int(x) for x in np.asarray(v).reshape(-1)]


def _axes(node: OnnxNode, ins: Sequence, idx: int = 1) -> Optional[List[int]]:
    """Reduce-op axes: attribute (≤opset 17) or input (≥18)."""
    if 'axes' in node.attrs:
        return [int(a) for a in node.attrs['axes']]
    if len(ins) > idx and ins[idx] is not None:
        return _ints(ins[idx])
    return None


class _Evaluator:
    def __init__(self, graph: OnnxGraph):
        self.graph = graph

    # -- generic helpers ---------------------------------------------------

    def _ew(self, fn_np, fn_jnp):
        def op(node, *ins):
            xs = [x for x in ins if x is not None]
            if _is_static(*xs):
                return fn_np(*xs)
            return fn_jnp(*(jnp.asarray(x) for x in xs))
        return op

    # -- evaluation --------------------------------------------------------

    def run(self, feeds: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        env: Dict[str, object] = {}
        env.update(self.graph.initializers)
        env.update(feeds)
        for node in self.graph.nodes:
            impl = getattr(self, f'op_{node.op_type}', None)
            if impl is None:
                raise NotImplementedError(
                    f'ONNX op {node.op_type} (node {node.name!r}) is not '
                    f'supported by onnx_eval')
            ins = [env[n] if n else None for n in node.inputs]
            out = impl(node, *ins)
            if not isinstance(out, (tuple, list)):
                out = (out,)
            for name, val in zip(node.outputs, out):
                if name:
                    env[name] = val
        return {o: env[o] for o in self.graph.outputs}

    # -- elementwise -------------------------------------------------------

    def op_Add(self, node, a, b):
        return a + b if _is_static(a, b) else jnp.asarray(a) + jnp.asarray(b)

    def op_Sub(self, node, a, b):
        return a - b if _is_static(a, b) else jnp.asarray(a) - jnp.asarray(b)

    def op_Mul(self, node, a, b):
        return a * b if _is_static(a, b) else jnp.asarray(a) * jnp.asarray(b)

    def op_Div(self, node, a, b):
        if _is_static(a, b):
            a, b = np.asarray(a), np.asarray(b)
            if np.issubdtype(a.dtype, np.integer) \
                    and np.issubdtype(b.dtype, np.integer):
                return a // b
            return a / b
        return jnp.asarray(a) / jnp.asarray(b)

    def op_Pow(self, node, a, b):
        return np.power(a, b) if _is_static(a, b) \
            else jnp.power(jnp.asarray(a), jnp.asarray(b))

    def op_Sqrt(self, node, x):
        return np.sqrt(x) if _is_static(x) else jnp.sqrt(x)

    def op_Erf(self, node, x):
        return jax.scipy.special.erf(jnp.asarray(x))

    def op_Exp(self, node, x):
        return jnp.exp(jnp.asarray(x))

    def op_Log(self, node, x):
        return jnp.log(jnp.asarray(x))

    def op_Neg(self, node, x):
        return -x if _is_static(x) else -jnp.asarray(x)

    def op_Abs(self, node, x):
        return np.abs(x) if _is_static(x) else jnp.abs(x)

    def op_Floor(self, node, x):
        return np.floor(x) if _is_static(x) else jnp.floor(x)

    def op_Ceil(self, node, x):
        return np.ceil(x) if _is_static(x) else jnp.ceil(x)

    def op_Tanh(self, node, x):
        return jnp.tanh(jnp.asarray(x))

    def op_Sigmoid(self, node, x):
        return jax.nn.sigmoid(jnp.asarray(x))

    def op_Relu(self, node, x):
        return jax.nn.relu(jnp.asarray(x))

    def op_LeakyRelu(self, node, x):
        return jax.nn.leaky_relu(jnp.asarray(x),
                                 node.attrs.get('alpha', 0.01))

    def op_Gelu(self, node, x):
        approx = node.attrs.get('approximate', 'none') == 'tanh'
        return jax.nn.gelu(jnp.asarray(x), approximate=approx)

    def op_HardSigmoid(self, node, x):
        a = node.attrs.get('alpha', 0.2)
        b = node.attrs.get('beta', 0.5)
        return jnp.clip(a * jnp.asarray(x) + b, 0.0, 1.0)

    def op_HardSwish(self, node, x):
        x = jnp.asarray(x)
        return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)

    def op_Softmax(self, node, x):
        return jax.nn.softmax(jnp.asarray(x),
                              axis=int(node.attrs.get('axis', -1)))

    def op_Clip(self, node, x, lo=None, hi=None):
        lo = None if lo is None else jnp.asarray(lo)
        hi = None if hi is None else jnp.asarray(hi)
        lo = node.attrs.get('min', lo)
        hi = node.attrs.get('max', hi)
        return jnp.clip(jnp.asarray(x), lo, hi)

    def op_Where(self, node, c, a, b):
        if _is_static(c, a, b):
            return np.where(c, a, b)
        return jnp.where(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b))

    def op_Equal(self, node, a, b):
        return np.equal(a, b) if _is_static(a, b) \
            else jnp.asarray(a) == jnp.asarray(b)

    def op_Less(self, node, a, b):
        return np.less(a, b) if _is_static(a, b) \
            else jnp.asarray(a) < jnp.asarray(b)

    def op_Greater(self, node, a, b):
        return np.greater(a, b) if _is_static(a, b) \
            else jnp.asarray(a) > jnp.asarray(b)

    def op_Not(self, node, x):
        return np.logical_not(x) if _is_static(x) else ~jnp.asarray(x)

    def op_And(self, node, a, b):
        return np.logical_and(a, b) if _is_static(a, b) \
            else jnp.asarray(a) & jnp.asarray(b)

    def op_Identity(self, node, x):
        return x

    def op_Cast(self, node, x):
        dt = _CAST_DTYPES[int(node.attrs['to'])]
        if _is_static(x):
            return np.asarray(x).astype(dt)
        return jnp.asarray(x).astype(dt)

    # -- reductions --------------------------------------------------------

    def _reduce(self, node, ins, fn_jnp, fn_np):
        x = ins[0]
        axes = _axes(node, ins)
        keep = bool(node.attrs.get('keepdims', 1))
        ax = None if axes is None else tuple(axes)
        if _is_static(x):
            return fn_np(np.asarray(x), axis=ax, keepdims=keep)
        return fn_jnp(jnp.asarray(x), axis=ax, keepdims=keep)

    def op_ReduceMean(self, node, *ins):
        return self._reduce(node, ins, jnp.mean, np.mean)

    def op_ReduceSum(self, node, *ins):
        return self._reduce(node, ins, jnp.sum, np.sum)

    def op_ReduceMax(self, node, *ins):
        return self._reduce(node, ins, jnp.max, np.max)

    def op_ReduceMin(self, node, *ins):
        return self._reduce(node, ins, jnp.min, np.min)

    def op_ReduceL2(self, node, *ins):
        x = jnp.asarray(ins[0])
        axes = _axes(node, ins)
        keep = bool(node.attrs.get('keepdims', 1))
        ax = None if axes is None else tuple(axes)
        return jnp.sqrt(jnp.sum(x * x, axis=ax, keepdims=keep))

    # -- shape plumbing ----------------------------------------------------

    def op_Shape(self, node, x):
        return np.asarray(np.shape(x), np.int64)

    def op_Constant(self, node):
        for key in ('value', 'value_float', 'value_int', 'value_floats',
                    'value_ints'):
            if key in node.attrs:
                return np.asarray(node.attrs[key])
        raise ValueError('Constant node without value')

    def op_ConstantOfShape(self, node, shape):
        fill = node.attrs.get('value')
        if fill is None:
            fill = np.zeros(1, np.float32)
        fill = np.asarray(fill).reshape(-1)[0]
        return np.full(_ints(shape), fill)

    def op_Range(self, node, start, limit, delta):
        return np.arange(int(np.asarray(start)), int(np.asarray(limit)),
                         int(np.asarray(delta)), np.int64)

    def op_Reshape(self, node, x, shape):
        target = _ints(shape)
        cur = list(np.shape(x))
        out = []
        for i, d in enumerate(target):
            if d == 0 and not node.attrs.get('allowzero', 0):
                out.append(cur[i])
            else:
                out.append(d)
        if _is_static(x):
            return np.asarray(x).reshape(out)
        return jnp.reshape(jnp.asarray(x), out)

    def op_Flatten(self, node, x):
        ax = int(node.attrs.get('axis', 1))
        shape = np.shape(x)
        lead = int(np.prod(shape[:ax])) if ax else 1
        x = jnp.asarray(x)
        return jnp.reshape(x, (lead, -1))

    def op_Transpose(self, node, x):
        perm = node.attrs.get('perm')
        if perm is None:
            perm = list(range(np.ndim(x)))[::-1]
        if _is_static(x):
            return np.transpose(np.asarray(x), perm)
        return jnp.transpose(jnp.asarray(x), perm)

    def op_Squeeze(self, node, x, axes=None):
        axes = _axes(node, (x, axes))
        if axes is None:
            ax = None
        else:
            ax = tuple(a % max(np.ndim(x), 1) for a in axes)
        if _is_static(x):
            return np.squeeze(np.asarray(x), axis=ax)
        return jnp.squeeze(jnp.asarray(x), axis=ax)

    def op_Unsqueeze(self, node, x, axes=None):
        axes = _axes(node, (x, axes))
        out_rank = np.ndim(x) + len(axes)
        ax = sorted(a % out_rank for a in axes)
        if _is_static(x):
            return np.expand_dims(np.asarray(x), tuple(ax))
        return jnp.expand_dims(jnp.asarray(x), tuple(ax))

    def op_Concat(self, node, *ins):
        ax = int(node.attrs['axis'])
        xs = [x for x in ins if x is not None]
        if _is_static(*xs):
            return np.concatenate([np.atleast_1d(np.asarray(x))
                                   for x in xs], axis=ax)
        return jnp.concatenate([jnp.asarray(x) for x in xs], axis=ax)

    def op_Split(self, node, x, split=None):
        ax = int(node.attrs.get('axis', 0))
        n_out = len(node.outputs)
        if 'split' in node.attrs:
            sizes = [int(s) for s in node.attrs['split']]
        elif split is not None:
            sizes = _ints(split)
        else:
            d = np.shape(x)[ax]
            q = -(-d // n_out)
            sizes = [q] * (n_out - 1) + [d - q * (n_out - 1)]
        offs = np.cumsum([0] + sizes)
        x = jnp.asarray(x)
        return tuple(
            jax.lax.slice_in_dim(x, int(offs[i]), int(offs[i + 1]), axis=ax)
            for i in range(n_out))

    def op_Slice(self, node, x, starts=None, ends=None, axes=None,
                 steps=None):
        if starts is None:                       # opset-9 attribute form
            starts = node.attrs['starts']
            ends = node.attrs['ends']
            axes = node.attrs.get('axes')
        starts, ends = _ints(starts), _ints(ends)
        axes = list(range(len(starts))) if axes is None else _ints(axes)
        steps = [1] * len(starts) if steps is None else _ints(steps)
        nd = np.ndim(x)
        sl = [slice(None)] * nd
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            ax = ax % nd
            dim = np.shape(x)[ax]
            if st < 0:
                st += dim
            if en < 0 and en > -(1 << 62):
                en += dim
            en = min(en, dim) if sp > 0 else max(en, -dim - 1)
            sl[ax] = slice(st, en, sp)
        if _is_static(x):
            return np.asarray(x)[tuple(sl)]
        return jnp.asarray(x)[tuple(sl)]

    def op_Gather(self, node, x, idx):
        ax = int(node.attrs.get('axis', 0))
        if _is_static(x, idx):
            return np.take(np.asarray(x), np.asarray(idx, np.int64),
                           axis=ax)
        return jnp.take(jnp.asarray(x), jnp.asarray(idx), axis=ax)

    def op_GatherElements(self, node, x, idx):
        ax = int(node.attrs.get('axis', 0))
        return jnp.take_along_axis(jnp.asarray(x), jnp.asarray(idx),
                                   axis=ax)

    def op_Expand(self, node, x, shape):
        target = _ints(shape)
        cur = list(np.shape(x))
        rank = max(len(target), len(cur))
        cur = [1] * (rank - len(cur)) + cur
        target = [1] * (rank - len(target)) + target
        out = [max(c, t) for c, t in zip(cur, target)]
        if _is_static(x):
            return np.broadcast_to(np.asarray(x).reshape(cur), out)
        return jnp.broadcast_to(jnp.asarray(x).reshape(cur), out)

    def op_Tile(self, node, x, reps):
        return jnp.tile(jnp.asarray(x), _ints(reps))

    def op_Pad(self, node, x, pads=None, value=None, axes=None):
        mode = node.attrs.get('mode', 'constant')
        if pads is None:
            pads = node.attrs['pads']
        pads = _ints(pads)
        nd = np.ndim(x)
        ax = list(range(nd)) if axes is None else _ints(axes)
        cfg = [(0, 0)] * nd
        half = len(pads) // 2
        for i, a in enumerate(ax):
            cfg[a % nd] = (pads[i], pads[half + i])
        x = jnp.asarray(x)
        if mode == 'constant':
            cval = 0.0 if value is None else float(np.asarray(value))
            return jnp.pad(x, cfg, constant_values=cval)
        return jnp.pad(x, cfg, mode={'reflect': 'reflect',
                                     'edge': 'edge'}[mode])

    def op_Resize(self, node, x, roi=None, scales=None, sizes=None):
        shape = list(np.shape(x))
        if sizes is not None and np.size(sizes):
            out_shape = _ints(sizes)
        else:
            sc = np.asarray(scales, np.float64).reshape(-1)
            out_shape = [int(round(d * s)) for d, s in zip(shape, sc)]
        mode = node.attrs.get('mode', 'nearest')
        method = {'nearest': 'nearest', 'linear': 'bilinear',
                  'cubic': 'bicubic'}[mode]
        return jax.image.resize(jnp.asarray(x), out_shape, method=method)

    # -- linear algebra ----------------------------------------------------

    def op_MatMul(self, node, a, b):
        return jnp.matmul(jnp.asarray(a), jnp.asarray(b),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.result_type(a, b))

    def op_Gemm(self, node, a, b, c=None):
        a, b = jnp.asarray(a), jnp.asarray(b)
        if node.attrs.get('transA', 0):
            a = a.T
        if node.attrs.get('transB', 0):
            b = b.T
        y = jnp.matmul(a, b) * node.attrs.get('alpha', 1.0)
        if c is not None:
            y = y + jnp.asarray(c) * node.attrs.get('beta', 1.0)
        return y

    def op_Einsum(self, node, *ins):
        return jnp.einsum(node.attrs['equation'],
                          *(jnp.asarray(x) for x in ins))

    # -- NN ops (NCHW, matching ONNX) --------------------------------------

    def op_Conv(self, node, x, w, b=None):
        x, w = jnp.asarray(x), jnp.asarray(w)
        kh_kw = w.shape[2:]
        strides = [int(s) for s in node.attrs.get(
            'strides', [1] * len(kh_kw))]
        dil = [int(d) for d in node.attrs.get(
            'dilations', [1] * len(kh_kw))]
        group = int(node.attrs.get('group', 1))
        pads = node.attrs.get('pads')
        auto = node.attrs.get('auto_pad', 'NOTSET')
        if auto in ('SAME_UPPER', 'SAME_LOWER'):
            padding = 'SAME'
        elif pads is None:
            padding = [(0, 0)] * len(kh_kw)
        else:
            pads = _ints(pads)
            half = len(pads) // 2
            padding = list(zip(pads[:half], pads[half:]))
        dn = ('NCHW', 'OIHW', 'NCHW') if len(kh_kw) == 2 else \
            ('NCW', 'OIW', 'NCW')
        y = jax.lax.conv_general_dilated(
            x, w, strides, padding, rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=group,
            preferred_element_type=jnp.float32).astype(x.dtype)
        if b is not None:
            bshape = (1, -1) + (1,) * len(kh_kw)
            y = y + jnp.asarray(b).reshape(bshape)
        return y

    def _pool(self, node, x, init, op, avg: bool):
        x = jnp.asarray(x)
        ks = [int(k) for k in node.attrs['kernel_shape']]
        strides = [int(s) for s in node.attrs.get('strides', [1] * len(ks))]
        pads = node.attrs.get('pads')
        if pads is None:
            padding = [(0, 0)] * len(ks)
        else:
            pads = _ints(pads)
            half = len(pads) // 2
            padding = list(zip(pads[:half], pads[half:]))
        window = (1, 1) + tuple(ks)
        strd = (1, 1) + tuple(strides)
        pad = [(0, 0), (0, 0)] + padding
        y = jax.lax.reduce_window(x, init, op, window, strd, pad)
        if avg:
            ones = jnp.ones_like(x)
            counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window,
                                           strd, pad)
            if node.attrs.get('count_include_pad', 0):
                counts = jnp.full_like(counts, float(np.prod(ks)))
            y = y / counts
        return y

    def op_MaxPool(self, node, x):
        return self._pool(node, x, -jnp.inf, jax.lax.max, avg=False)

    def op_AveragePool(self, node, x):
        return self._pool(node, x, 0.0, jax.lax.add, avg=True)

    def op_GlobalAveragePool(self, node, x):
        x = jnp.asarray(x)
        axes = tuple(range(2, x.ndim))
        return jnp.mean(x, axis=axes, keepdims=True)

    def op_LayerNormalization(self, node, x, scale, bias=None):
        ax = int(node.attrs.get('axis', -1))
        eps = node.attrs.get('epsilon', 1e-5)
        x = jnp.asarray(x)
        axes = tuple(range(ax % x.ndim, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + eps) * jnp.asarray(scale)
        if bias is not None:
            y = y + jnp.asarray(bias)
        return y

    def op_BatchNormalization(self, node, x, scale, bias, mean, var):
        eps = node.attrs.get('epsilon', 1e-5)
        x = jnp.asarray(x)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        scale = jnp.asarray(scale).reshape(shape)
        bias = jnp.asarray(bias).reshape(shape)
        mean = jnp.asarray(mean).reshape(shape)
        var = jnp.asarray(var).reshape(shape)
        return (x - mean) / jnp.sqrt(var + eps) * scale + bias

    def op_InstanceNormalization(self, node, x, scale, bias):
        eps = node.attrs.get('epsilon', 1e-5)
        x = jnp.asarray(x)
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return ((x - mean) / jnp.sqrt(var + eps)
                * jnp.asarray(scale).reshape(shape)
                + jnp.asarray(bias).reshape(shape))


def evaluate(graph: OnnxGraph,
             feeds: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Evaluate the graph eagerly (or under an enclosing jit)."""
    return _Evaluator(graph).run(feeds)


def make_runner(graph: OnnxGraph):
    """jit-compiled single-input → single-output runner.

    Weights are captured as constants (folded into the executable); the
    input name defaults to the graph's first non-initializer input.
    """
    input_names = [n for n in graph.inputs if n not in graph.initializers]

    @jax.jit
    def run(x):
        out = evaluate(graph, {input_names[0]: x})
        return out[graph.outputs[0]]

    return run
