"""Oracle loader: import the REFERENCE torch model definitions from
/root/reference as ground truth for full-model parity tests.

The reference package can't be imported directly (its __init__ pulls
dotenv/torchvision/shapely and network-touching infra), so this module
mounts the reference source tree under a synthetic ``reforacle`` package
with:

* the framework infra modules (``common``/``config``/``utils``) replaced by
  attribute-granting stubs — the model *classes* are what we exec, and
  they only need their base classes to exist;
* a faithful mini-``torchvision`` providing ``resnet34`` and ``vgg16_bn``
  with torchvision-compatible module names (so state_dict keys match what
  the real checkpoints contain).

Only used by tests; never shipped. This is NOT reference code reuse in the
framework — it is the parity oracle SURVEY.md §7.2/§7.10 prescribes.
"""
from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = '/root/reference/manga_translator'


# ---------------------------------------------------------------------------
# mini-torchvision: resnet34 + vgg16_bn with torchvision state_dict layout
# ---------------------------------------------------------------------------

def _build_torchvision():
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3)):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0], 1)
            self.layer2 = self._make_layer(128, layers[1], 2)
            self.layer3 = self._make_layer(256, layers[2], 2)
            self.layer4 = self._make_layer(512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, 1000)

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))
            layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            layers += [BasicBlock(planes, planes) for _ in range(blocks - 1)]
            return nn.Sequential(*layers)

    def resnet34(pretrained=False, **kw):
        return ResNet()

    # VGG16-BN features: cfg D with batchnorm
    _VGG16 = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512, 'M']

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            layers, in_ch = [], 3
            for v in _VGG16:
                if v == 'M':
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers += [nn.Conv2d(in_ch, v, 3, padding=1),
                               nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
                    in_ch = v
            self.features = nn.Sequential(*layers)

    def vgg16_bn(pretrained=False, **kw):
        return VGG()

    tv = types.ModuleType('torchvision')
    models = types.ModuleType('torchvision.models')
    models.resnet34 = resnet34
    models.vgg16_bn = vgg16_bn
    tv.models = models
    # transformers probes torchvision.__spec__ to decide availability —
    # a spec-less fake module makes it raise instead of skipping
    import importlib.machinery
    tv.__spec__ = importlib.machinery.ModuleSpec('torchvision', None)
    models.__spec__ = importlib.machinery.ModuleSpec(
        'torchvision.models', None)
    return tv, models


def _build_timm():
    """Functional mini-`timm.layers` (timm is not in this image): ONLY the
    symbols `detection/dbnet_convnext.py` imports, with timm's exact
    semantics for the configurations that model instantiates (channels-last
    LayerNorm eps=1e-6, Linear Mlp with fc1/fc2 naming, depthwise
    create_conv2d with symmetric '' padding). Stubbing these (like the rest
    of _STUB_PREFIXES) would break real compute, and the whole point of the
    dbconvnext oracle is real compute."""
    import collections.abc
    import importlib.machinery
    from functools import partial
    from itertools import repeat

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class LayerNorm(nn.LayerNorm):
        def __init__(self, num_channels, eps=1e-6, affine=True):
            super().__init__(num_channels, eps=eps,
                             elementwise_affine=affine)

    class LayerNorm2d(nn.LayerNorm):
        def __init__(self, num_channels, eps=1e-6, affine=True):
            super().__init__(num_channels, eps=eps,
                             elementwise_affine=affine)

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, self.normalized_shape, self.weight,
                             self.bias, self.eps)
            return x.permute(0, 3, 1, 2)

    def to_ntuple(n):
        def parse(x):
            if isinstance(x, collections.abc.Iterable) \
                    and not isinstance(x, str):
                return tuple(x)
            return tuple(repeat(x, n))
        return parse

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, norm_layer=None,
                     bias=True, drop=0., use_conv=False):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            bias = to_ntuple(2)(bias)
            linear = partial(nn.Conv2d, kernel_size=1) if use_conv \
                else nn.Linear
            self.fc1 = linear(in_features, hidden_features, bias=bias[0])
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.norm = norm_layer(hidden_features) \
                if norm_layer is not None else nn.Identity()
            self.fc2 = linear(hidden_features, out_features, bias=bias[1])
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(
                self.drop1(self.act(self.fc1(x))))))

    class GlobalResponseNormMlp(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError('use_grn is never set by the '
                                      'reference dbnet_convnext model')

    def get_padding(kernel_size, stride=1, dilation=1):
        return ((stride - 1) + dilation * (kernel_size - 1)) // 2

    def create_conv2d(in_chs, out_chs, kernel_size, **kwargs):
        depthwise = kwargs.pop('depthwise', False)
        groups = in_chs if depthwise else kwargs.pop('groups', 1)
        padding = kwargs.pop('padding', '')
        stride = kwargs.get('stride', 1)
        dilation = kwargs.get('dilation', 1)
        if isinstance(padding, str):
            # '' and static-'same' both resolve to symmetric padding for
            # the odd-k / stride-1 shapes this model uses
            padding = get_padding(kernel_size, stride, dilation)
        return nn.Conv2d(in_chs, out_chs, kernel_size, padding=padding,
                         groups=groups, **kwargs)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0., scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity; never used with p>0
            return x

    class AvgPool2dSame(nn.AvgPool2d):
        pass

    def make_divisible(v, divisor=8, min_value=None, round_limit=.9):
        min_value = min_value or divisor
        new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
        if new_v < round_limit * v:
            new_v += divisor
        return new_v

    def get_act_layer(name):
        if callable(name):
            return name
        return {'gelu': nn.GELU, 'relu': nn.ReLU,
                'silu': nn.SiLU}[name]

    timm = types.ModuleType('timm')
    layers = types.ModuleType('timm.layers')
    for k, v in (('trunc_normal_', torch.nn.init.trunc_normal_),
                 ('AvgPool2dSame', AvgPool2dSame), ('DropPath', DropPath),
                 ('Mlp', Mlp),
                 ('GlobalResponseNormMlp', GlobalResponseNormMlp),
                 ('LayerNorm2d', LayerNorm2d), ('LayerNorm', LayerNorm),
                 ('create_conv2d', create_conv2d),
                 ('get_act_layer', get_act_layer),
                 ('make_divisible', make_divisible),
                 ('to_ntuple', to_ntuple)):
        setattr(layers, k, v)
    timm.layers = layers
    timm.__spec__ = importlib.machinery.ModuleSpec('timm', None)
    layers.__spec__ = importlib.machinery.ModuleSpec('timm.layers', None)
    return timm, layers


def _stub_module(name):
    """Module whose every attribute is a do-nothing class (usable as a base
    class or a callable). Acts as a package so arbitrary submodules under it
    resolve to further stubs (see _StubFinder)."""
    mod = types.ModuleType(name)
    mod.__path__ = []

    def _getattr(attr, _name=name):
        if attr.startswith('__'):
            raise AttributeError(attr)
        return type(attr, (), {
            '__init__': lambda self, *a, **k: None,
            '__call__': lambda self, *a, **k: None,
        })

    mod.__getattr__ = _getattr
    return mod


# Module prefixes served as stubs: framework infra the model classes only
# need at call time, plus pip deps absent from this image.
_STUB_PREFIXES = (
    'manga_translator', 'pyclipper', 'skimage', 'shapely', 'omegaconf',
    'reforacle.utils', 'reforacle.config', 'reforacle.args',
    'reforacle.detection.common', 'reforacle.ocr.common',
    'reforacle.inpainting.common', 'reforacle.upscaling.common',
    'reforacle.colorization.common',
)


class _StubFinder:
    """Meta-path finder serving do-nothing stub modules for any name under
    _STUB_PREFIXES (arbitrary depth)."""

    def find_spec(self, fullname, path=None, target=None):
        import importlib.machinery
        if not any(fullname == p or fullname.startswith(p + '.')
                   for p in _STUB_PREFIXES):
            return None

        class _Loader:
            def create_module(self, spec):
                return _stub_module(spec.name)

            def exec_module(self, module):
                pass

        return importlib.machinery.ModuleSpec(fullname, _Loader(),
                                              is_package=True)


def _pkg(name, path):
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


_installed = False


def install():
    global _installed
    if _installed:
        return
    import os
    if not os.path.isdir(REF_ROOT):
        import pytest
        pytest.skip('reference tree not mounted', allow_module_level=True)
    if 'torchvision' not in sys.modules:
        tv, models = _build_torchvision()
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = models
    if 'timm' not in sys.modules:
        timm, layers = _build_timm()
        sys.modules['timm'] = timm
        sys.modules['timm.layers'] = layers

    sys.meta_path.insert(0, _StubFinder())
    _pkg('reforacle', REF_ROOT)
    for sub in ('detection', 'ocr', 'inpainting', 'upscaling',
                'colorization'):
        _pkg(f'reforacle.{sub}', f'{REF_ROOT}/{sub}')
    # ldm/modules/diffusionmodules/model.py uses ABSOLUTE 'ldm.util'
    # imports — mount the vendored ldm tree under that top-level name too
    _pkg('ldm', f'{REF_ROOT}/inpainting/ldm')
    _installed = True


def load(dotted: str):
    """Import e.g. 'detection.default_utils.DBNet_resnet34' from the
    reference tree (with infra stubbed)."""
    install()
    return importlib.import_module(f'reforacle.{dotted}')
