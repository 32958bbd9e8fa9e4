"""Panel detection parity vs the reference's vendored Kumiko.

SURVEY §2.2 / VERDICT coverage #21: our compact panel re-derivation
(utils/panel.py) only needs to produce the same panel RECTANGLES in the
same reading order as Kumiko (consumers: utils/sort.py reading-order
sort). These tests run the reference's own Kumiko (imported from
/root/reference with host-env deps stubbed) on synthetic pages and assert
rect-level agreement.
"""
import sys
import types

import cv2
import numpy as np
import pytest

from manga_image_translator_tpu.utils.panel import get_panels_from_array


def _reference_panels(img_rgb):
    """Run the reference's Kumiko on an RGB array → list of (x, y, w, h)."""
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    # tests/ref_oracle.py installs a meta-path finder that serves
    # do-nothing stubs for every manga_translator.* import — suspend it
    # (and drop its cached stub modules) so the REAL Kumiko loads here
    suspended = [f for f in sys.meta_path
                 if type(f).__name__ == '_StubFinder']
    for f in suspended:
        sys.meta_path.remove(f)
    for k in list(sys.modules):
        if k.startswith('manga_translator'):
            del sys.modules[k]
    # ref_oracle's torchvision stub carries no __spec__, which makes
    # importlib reject `import torchvision.x` chains — patch one in
    import importlib.machinery
    for name in ('torchvision', 'torchvision.models'):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, '__spec__', None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)

    class _AnyAttr(types.ModuleType):
        __file__ = '<stub>'

        def __getattr__(self, item):
            if item.startswith('__') and item.endswith('__'):
                raise AttributeError(item)
            return _AnyAttr(f'{self.__name__}.{item}')

        def __call__(self, *a, **k):
            return None

    for _ in range(60):
        try:
            import manga_translator.utils.panel.lib.page  # noqa: F401
            from manga_translator.utils.panel import (
                get_panels_from_array as ref)
            break
        except ModuleNotFoundError as e:
            import importlib.machinery
            mod = _AnyAttr(e.name)
            mod.__spec__ = importlib.machinery.ModuleSpec(e.name, None)
            sys.modules[e.name] = mod
            for k in list(sys.modules):
                if k.startswith('manga_translator'):
                    del sys.modules[k]
    # this cv2 build returns LSD lines as (N, 4); the reference's Kumiko
    # (written against an older OpenCV) indexes (N, 1, 4) — shim it
    ref_page = sys.modules['manga_translator.utils.panel.lib.page']

    class _LSDShim:
        def __init__(self, inner):
            self._inner = inner

        def detect(self, img):
            res = self._inner.detect(img)
            lines = res[0]
            if lines is not None and getattr(lines, 'ndim', 0) == 2:
                lines = lines.reshape(-1, 1, 4)
            return (lines,) + tuple(res[1:])

    orig = ref_page.cv.createLineSegmentDetector
    ref_page.cv.createLineSegmentDetector = (
        lambda *a, **k: _LSDShim(orig(*a, **k)))
    try:
        return [tuple(p) for p in ref(img_rgb)]
    finally:
        ref_page.cv.createLineSegmentDetector = orig
        # restore the oracle suite's stub finder and purge the REAL
        # modules this import cached, so later oracle tests still see
        # their stubs
        sys.meta_path[0:0] = suspended
        for k in list(sys.modules):
            if k.startswith('manga_translator'):
                del sys.modules[k]


def _page_with_panels(rects, size=(600, 800), bg=255, fg=235):
    """White page with light-gray panel interiors and black borders."""
    h, w = size[1], size[0]
    img = np.full((h, w, 3), bg, np.uint8)
    for (x, y, pw, ph) in rects:
        cv2.rectangle(img, (x, y), (x + pw, y + ph), (0, 0, 0), 3)
        img[y + 3:y + ph - 2, x + 3:x + pw - 2] = fg
    return img


def _match(ours, refs, tol=20):
    """Greedy rect matching within ``tol`` px on every coordinate."""
    refs = list(refs)
    for r in ours:
        best = None
        for i, q in enumerate(refs):
            if all(abs(a - b) <= tol for a, b in zip(r, q)):
                best = i
                break
        assert best is not None, f'{r} unmatched in {refs}'
        refs.pop(best)


@pytest.mark.parametrize('layout', [
    # 2x2 grid
    [(40, 40, 240, 330), (320, 40, 240, 330),
     (40, 420, 240, 330), (320, 420, 240, 330)],
    # full-width top + two bottom
    [(40, 40, 520, 330), (40, 420, 240, 330), (320, 420, 240, 330)],
    # single splash panel
    [(40, 40, 520, 710)],
])
def test_panels_match_reference_kumiko(layout):
    img = _page_with_panels(layout)
    # no skip: a broken reference import must FAIL this parity suite
    refs = _reference_panels(img)
    ours = get_panels_from_array(img)
    # same number of panels detected…
    assert len(ours) == len(refs), (ours, refs)
    # …covering the same rectangles
    _match(ours, refs)


def _bridged_pages():
    """Pages whose panel borders are CONNECTED across a gutter, so the
    initial external contour spans several panels — exactly the case
    Kumiko's recursive split (`lib/panel.py` `split()`) exists for."""
    # horizontal bridge between two side-by-side panels
    img_h = _page_with_panels([(40, 40, 240, 330), (320, 40, 240, 330)])
    cv2.rectangle(img_h, (275, 180), (325, 195), (0, 0, 0), -1)
    # vertical bridge between stacked panels in a 2x2 grid
    img_v = _page_with_panels([(40, 40, 240, 330), (320, 40, 240, 330),
                               (40, 420, 240, 330), (320, 420, 240, 330)])
    cv2.rectangle(img_v, (150, 365), (165, 425), (0, 0, 0), -1)
    # double bridge: both columns connected -> two recursive splits
    img_2 = _page_with_panels([(40, 40, 240, 330), (320, 40, 240, 330),
                               (40, 420, 240, 330), (320, 420, 240, 330)])
    cv2.rectangle(img_2, (150, 365), (165, 425), (0, 0, 0), -1)
    cv2.rectangle(img_2, (430, 365), (445, 425), (0, 0, 0), -1)
    return [('hbridge', img_h), ('vbridge', img_v), ('bridge2', img_2)]


@pytest.mark.parametrize('name,img', _bridged_pages(),
                         ids=[n for n, _ in _bridged_pages()])
def test_bridged_panels_split_like_kumiko(name, img):
    """Merged contours are split on gutters (VERDICT r3 Missing #2)."""
    refs = _reference_panels(img)
    ours = get_panels_from_array(img)
    assert len(ours) == len(refs), (ours, refs)
    _match(ours, refs)


def test_nested_panel_merged_like_kumiko():
    """An inset panel >50%-contained in a bigger one merges into it
    (reference merge_panels, `lib/page.py:298-313`)."""
    img = _page_with_panels([(40, 40, 520, 710)])
    cv2.rectangle(img, (80, 80), (280, 280), (0, 0, 0), 3)
    img[83:278, 83:278] = 210
    refs = _reference_panels(img)
    ours = get_panels_from_array(img)
    assert len(ours) == len(refs), (ours, refs)
    _match(ours, refs)


def test_panel_reading_order_stable():
    layout = [(40, 40, 240, 330), (320, 40, 240, 330),
              (40, 420, 520, 330)]
    img = _page_with_panels(layout)
    ours = get_panels_from_array(img)
    assert len(ours) == 3
    # top row before bottom row
    assert max(ours[0][1], ours[1][1]) < ours[2][1]
