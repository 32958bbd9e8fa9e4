"""Measure the PyTorch reference's hot-stage latencies on CPU.

BASELINE.md obligation: the reference publishes no numbers, so the
BASELINE.json configs "must be measured by us". This times the reference's
own nn.Modules (imported from /root/reference, seeded random weights — the
checkpoints are not downloadable in this environment; conv/attention
latency does not depend on weight values) at the same shapes bench.py
uses: DBNet @1536², 48px OCR beam decode on a 16-crop chunk, LaMa-large
FFC generator @1536², AOT @1536².

Missing third-party modules the reference imports at package-init time
(dotenv etc.) are stubbed — only the model code runs here.
"""
import sys
import time
import types

import numpy as np

# -- stub host-env deps the reference pulls in at import time --------------
sys.path.insert(0, '/root/reference')
import torch  # noqa: E402  (import torch BEFORE stubbing — stub modules in
#                            sys.modules confuse torch's import machinery)


class _AnyAttr(types.ModuleType):
    __file__ = '<stub>'

    def __getattr__(self, item):
        if item.startswith('__') and item.endswith('__'):
            raise AttributeError(item)
        return _AnyAttr(f'{self.__name__}.{item}')

    def __call__(self, *a, **k):
        return None


def _stub(name):
    if name not in sys.modules:
        import importlib.machinery
        mod = _AnyAttr(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod


for name in ['dotenv', 'langcodes', 'hyphen', 'pyclipper', 'pydensecrf',
             'pydensecrf.densecrf', 'pydensecrf.utils']:
    _stub(name)

torch.manual_seed(0)
torch.set_num_threads(__import__('os').cpu_count() or 1)


def _import_with_stubs(modname):
    """Import, auto-stubbing any missing third-party module (the reference
    pulls many host-env deps at package-import time that the model code
    never touches)."""
    for _ in range(30):
        try:
            return __import__(modname, fromlist=['*'])
        except ModuleNotFoundError as e:
            _stub(e.name)
            # purge partially-initialized reference packages so the retry
            # re-imports them cleanly
            for k in list(sys.modules):
                if k.startswith('manga_translator'):
                    del sys.modules[k]
    raise RuntimeError(f'could not import {modname}')


def _install_torchvision_resnet34():
    """torchvision is absent in this image; the reference's DBNet only uses
    resnet34's conv1/bn1/relu/maxpool/layer1-4 attributes, so provide a
    faithful arch-only implementation (timing equals torchvision's: same
    layer shapes), injected as a torchvision.models stub."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, cin, cout, stride=1, down=None):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.down = down

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class ResNet34(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make(64, 3, 1)
            self.layer2 = self._make(128, 4, 2)
            self.layer3 = self._make(256, 6, 2)
            self.layer4 = self._make(512, 3, 2)

        def _make(self, planes, blocks, stride):
            down = None
            if stride != 1 or self.inplanes != planes:
                down = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))
            layers = [BasicBlock(self.inplanes, planes, stride, down)]
            self.inplanes = planes
            layers += [BasicBlock(planes, planes) for _ in range(blocks - 1)]
            return nn.Sequential(*layers)

    import importlib.machinery
    tv = types.ModuleType('torchvision')
    tvm = types.ModuleType('torchvision.models')
    tv.__spec__ = importlib.machinery.ModuleSpec('torchvision', None)
    tvm.__spec__ = importlib.machinery.ModuleSpec('torchvision.models',
                                                  None)
    tvm.resnet34 = lambda *a, **k: ResNet34()
    tv.models = tvm
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.models'] = tvm


_install_torchvision_resnet34()


def timed(fn, n=3, warmup=1):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_dbnet():
    TextDetection = _import_with_stubs(
        'manga_translator.detection.default_utils.DBNet_resnet34'
    ).TextDetection
    model = TextDetection().eval()
    x = torch.randn(1, 3, 1536, 1536)
    with torch.no_grad():
        t = timed(lambda: model(x))
    print(f'reference DBNet-R34 @1536 (CPU): {t*1e3:.0f} ms')
    return t


def bench_ocr48():
    OCR = _import_with_stubs('manga_translator.ocr.model_48px').OCR
    model = OCR(dictionary=list(range(7935)), max_len=25).eval()
    img = torch.randn(16, 3, 48, 192)
    widths = [192] * 16
    with torch.no_grad():
        t = timed(lambda: model.infer_beam_batch(
            img, widths, beams_k=5, max_seq_length=25), n=2)
    print(f'reference 48px OCR beam chunk=16 max_len=25 (CPU): {t*1e3:.0f} ms')
    return t


def bench_lama():
    m = _import_with_stubs('manga_translator.inpainting.inpainting_lama_mpe')
    model = m.LamaFourier(build_discriminator=False, use_mpe=False,
                          large_arch=True)
    gen = model.generator.eval()
    img = torch.randn(1, 3, 1536, 1536)
    mask = (torch.rand(1, 1, 1536, 1536) > 0.9).float()
    with torch.no_grad():
        t = timed(lambda: gen(img * (1 - mask), mask), n=2)
    print(f'reference LaMa-large @1536 (CPU): {t*1e3:.0f} ms')
    return t


def bench_aot():
    AOTGenerator = _import_with_stubs('manga_translator.inpainting.inpainting_aot').AOTGenerator
    gen = AOTGenerator().eval()
    img = torch.randn(1, 3, 1536, 1536)
    mask = (torch.rand(1, 1, 1536, 1536) > 0.9).float()
    with torch.no_grad():
        t = timed(lambda: gen(img * (1 - mask), mask), n=2)
    print(f'reference AOT @1536 (CPU): {t*1e3:.0f} ms')
    return t


if __name__ == '__main__':
    print(f'torch {torch.__version__}, threads={torch.get_num_threads()}')
    results = {}
    todo = sys.argv[1:] or ['dbnet', 'ocr48', 'lama_large', 'aot']
    for name, fn in [('dbnet', bench_dbnet), ('ocr48', bench_ocr48),
                     ('lama_large', bench_lama), ('aot', bench_aot)]:
        if name not in todo:
            continue
        try:
            results[name] = fn()
        except Exception as e:
            print(f'{name} FAILED: {type(e).__name__}: {e}')
    import json
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))
