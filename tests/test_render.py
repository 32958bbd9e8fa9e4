"""Rendering tests, modeled on reference test/test_render.py: synthetic
TextBlocks onto blank canvases; assertions check pixels actually changed and
layout helpers behave."""
import asyncio

import numpy as np

from manga_image_translator_tpu.rendering import (
    dispatch,
    dispatch_eng_render,
    fg_bg_compare,
)
from manga_image_translator_tpu.rendering import text_render
from manga_image_translator_tpu.utils.textblock import TextBlock


def make_region(lines, texts, translation, **kw):
    blk = TextBlock(lines, texts=texts, font_size=kw.pop('font_size', 20),
                    **kw)
    blk.translation = translation
    return blk


def test_put_text_horizontal_draws_pixels():
    text_render.set_font('')
    box = text_render.put_text_horizontal(24, 'Hello world', 200, 40,
                                          'center', False, (0, 0, 0),
                                          (255, 255, 255))
    assert box.shape[2] == 4
    assert box[:, :, 3].max() == 255  # some opaque pixels


def test_put_text_vertical_columns():
    text_render.set_font('')
    box = text_render.put_text_vertical(20, 'ABCDEFGH', 80, 'left',
                                        (0, 0, 0), None)
    assert box.shape[2] == 4
    # 80px height / 20px font -> 4 chars per column -> 2 columns
    assert box.shape[1] >= 2 * 20


def test_break_text_wraps_words():
    font = text_render.get_cached_font(20)
    lines = text_render._break_text(font, 'aaa bbb ccc ddd eee', 80)
    assert len(lines) > 1
    assert all(font.getlength(l) <= 110 for l in lines)


def test_break_text_cjk_char_level():
    font = text_render.get_cached_font(20)
    lines = text_render._break_text(font, '日本語のテキストです', 60)
    assert len(lines) > 1


def test_fg_bg_compare_pushes_contrast():
    fg, bg = fg_bg_compare(np.array([10, 10, 10]), np.array([12, 12, 12]))
    assert tuple(bg) == (255, 255, 255)
    fg, bg = fg_bg_compare(np.array([200, 200, 200]), np.array([205, 205, 205]))
    assert tuple(bg) == (0, 0, 0)


def test_dispatch_renders_on_canvas():
    img = np.full((300, 400, 3), 255, np.uint8)
    region = make_region([[[50, 50], [350, 50], [350, 100], [50, 100]]],
                         ['hello'], 'TRANSLATED', target_lang='ENG')
    out = asyncio.run(dispatch(img.copy(), [region]))
    assert (out != img).any()


def test_dispatch_skips_empty_translation():
    img = np.full((100, 100, 3), 255, np.uint8)
    region = make_region([[[10, 10], [90, 10], [90, 40], [10, 40]]],
                         ['x'], '')
    out = asyncio.run(dispatch(img.copy(), [region]))
    np.testing.assert_array_equal(out, img)


def test_vertical_region_renders():
    img = np.full((400, 300, 3), 255, np.uint8)
    region = make_region([[[200, 50], [240, 50], [240, 350], [200, 350]]],
                         ['テスト'], 'テスト', direction='v',
                         target_lang='JPN')
    out = asyncio.run(dispatch(img.copy(), [region]))
    assert (out != img).any()


def test_eng_render():
    img = np.full((300, 400, 3), 255, np.uint8)
    region = make_region([[[50, 50], [350, 50], [350, 150], [50, 150]]],
                         ['hello'], 'Hello there, world!',
                         target_lang='ENG')
    out = asyncio.run(dispatch_eng_render(img.copy(), img, [region]))
    assert (out != img).any()


def test_render_mask_filled():
    img = np.full((200, 200, 3), 255, np.uint8)
    mask = np.zeros((200, 200), np.uint8)
    region = make_region([[[20, 20], [180, 20], [180, 60], [20, 60]]],
                         ['a'], 'text', target_lang='ENG')
    asyncio.run(dispatch(img, [region], render_mask=mask))
    assert mask.max() == 1


class TestTypography:
    def test_rule_syllables(self):
        from manga_image_translator_tpu.rendering.hyphenation import \
            syllables
        # whole short words stay intact
        assert syllables('the') == ['the']
        # rule-based splits keep >=2 chars per side and reassemble
        for word in ('hyphenation', 'translator', 'wonderful', 'computer'):
            syls = syllables(word, 'en_US')
            assert ''.join(syls) == word
            assert len(syls) >= 2
            assert all(len(s) >= 2 for s in syls)

    def test_liang_patterns(self):
        from manga_image_translator_tpu.rendering.hyphenation import \
            LiangHyphenator
        # the canonical Liang example: hy-phen-ation with TeX patterns
        h = LiangHyphenator(['hy3ph', 'he2n', 'hena4', 'hen5at', 'hina',
                             '5ation', 'n2at', 'itio', '2io', 'o2n'])
        assert h.syllables('hyphenation') == ['hy', 'phen', 'ation']

    def test_calc_horizontal_hyphenates(self):
        from manga_image_translator_tpu.rendering import text_render
        text_render.set_font('')
        lines, h = text_render.calc_horizontal(
            20, 'extraordinary hyphenation behaviour', 120, 400, 'en_US')
        assert len(lines) >= 2
        # hyphen appears when a word is split mid-line
        joined = ''.join(lines)
        assert joined.replace('-', '').replace(' ', '') == \
            'extraordinaryhyphenationbehaviour'.replace(' ', '')

    def test_lines_fit_width(self):
        from manga_image_translator_tpu.rendering import text_render
        text_render.set_font('')
        font = text_render.get_cached_font(18)
        width = 150
        lines, _ = text_render.calc_horizontal(
            18, 'some reasonably long sentence with several normal words',
            width, 600, 'en_US')
        for line in lines:
            assert font.getlength(line) <= width * 1.6 + 18

    def test_horizontal_box_contains_glyphs(self):
        from manga_image_translator_tpu.rendering import text_render
        text_render.set_font('')
        box = text_render.put_text_horizontal(
            24, 'HELLO WORLD WRAP TEST', 140, 200, fg=(0, 0, 0),
            bg=(255, 255, 255))
        # opaque pixels exist and do not touch the left/right borders
        alpha = box[:, :, 3]
        assert alpha.max() == 255
        ys, xs = np.nonzero(alpha)
        assert xs.min() >= 0 and xs.max() < box.shape[1]
        # at least two lines rendered (wrapped)
        rows = np.unique((ys // 24))
        assert len(rows) >= 2

    def test_cjk_compat_forms(self):
        from manga_image_translator_tpu.rendering.text_render import \
            cjk_compat_form
        assert cjk_compat_form('「', 1)[0] == '﹁'
        assert cjk_compat_form('「', 0)[0] == '「'
        assert cjk_compat_form('﹁', 0)[0] == '「'
        assert cjk_compat_form('ー', 1) == ('ー', 90)
        assert cjk_compat_form('A', 1) == ('A', 0)

    def test_vertical_layout_columns(self):
        from manga_image_translator_tpu.rendering import text_render
        text_render.set_font('')
        box = text_render.put_text_vertical(
            20, 'テスト「縦書き」です。', 80, fg=(0, 0, 0), bg=None)
        assert box.shape[2] == 4
        # multiple columns for text longer than the height budget
        alpha = box[:, :, 3]
        cols_with_ink = np.unique(np.nonzero(alpha)[1] // 24)
        assert len(cols_with_ink) >= 2


class TestHyphenProvisioning:
    def test_download_dictionaries_offline_skips(self, tmp_path, capsys):
        """Zero-egress environment: every fetch fails, none raise, and the
        rule syllabifier stays the fallback."""
        from manga_image_translator_tpu.rendering.hyphenation import (
            download_dictionaries)
        done = download_dictionaries(['en_US'], dest=str(tmp_path))
        assert done == [] or done == ['en_US']   # egress-dependent

    def test_existing_dict_counts_as_provisioned(self, tmp_path):
        from manga_image_translator_tpu.rendering.hyphenation import (
            download_dictionaries)
        (tmp_path / 'hyph_en_US.dic').write_text('ISO8859-1\n.ab1c\n')
        assert download_dictionaries(['en_US'],
                                     dest=str(tmp_path)) == ['en_US']

    def test_provisioned_dict_is_loaded(self, tmp_path, monkeypatch):
        from manga_image_translator_tpu.rendering import hyphenation as hy
        (tmp_path / 'hyph_xx.dic').write_text(
            'UTF-8\n1ba\n')
        monkeypatch.setenv('MIT_TPU_HYPHEN_DIR', str(tmp_path))
        hy._HYPHENATORS.clear() if hasattr(hy, '_HYPHENATORS') else None
        h = hy._load_dict('xx')
        assert h is not None
        assert h.syllables('ababa')  # pattern engine engaged


class TestBalloonFit:
    """Balloon-shape-constrained ENG layout (reference
    text_render_eng.py:158-334 layout_lines_aligncenter behavior)."""

    @staticmethod
    def _ellipse_page(h=400, w=500, cx=250, cy=200, ax=180, ay=120):
        # dark page with a white elliptical balloon
        img = np.full((h, w, 3), 40, np.uint8)
        yy, xx = np.mgrid[:h, :w]
        inside = ((xx - cx) / ax) ** 2 + ((yy - cy) / ay) ** 2 <= 1.0
        img[inside] = 255
        return img, inside

    def test_layout_respects_balloon_shape(self):
        from manga_image_translator_tpu.rendering.text_render_eng import (
            layout_lines_in_balloon)
        img, inside = self._ellipse_page()
        region = (inside.astype(np.uint8)) * 255
        font = text_render.get_cached_font(20)
        words = 'this text must stay inside the round speech balloon'.split()
        widths = [font.getlength(w) for w in words]
        lines = layout_lines_in_balloon(region, words, widths,
                                        font.getlength(' '), 24)
        assert lines is not None and len(lines) >= 3
        # every line's span endpoints lie inside the ellipse
        for l in lines:
            for x in (l.x, int(l.x + l.width)):
                assert inside[l.y:l.y + 24, x].all()
        # reading order is preserved top-to-bottom
        joined = ' '.join(l.text for l in sorted(lines, key=lambda l: l.y))
        assert joined == ' '.join(words)
        # lines near the top/bottom are narrower than the central line
        mid = max(lines, key=lambda l: l.width)
        assert lines[0].width < mid.width

    def test_layout_returns_none_when_too_small(self):
        from manga_image_translator_tpu.rendering.text_render_eng import (
            layout_lines_in_balloon)
        region = np.zeros((60, 60), np.uint8)
        region[20:40, 20:40] = 255
        font = text_render.get_cached_font(20)
        words = ['unfittably', 'enormous', 'paragraph', 'of', 'many',
                 'words'] * 4
        widths = [font.getlength(w) for w in words]
        assert layout_lines_in_balloon(region, words, widths,
                                       font.getlength(' '), 24) is None

    def test_eng_render_stays_inside_balloon(self):
        img, inside = self._ellipse_page()
        region = make_region(
            [[[170, 160], [330, 160], [330, 240], [170, 240]]],
            ['hello'], 'Words fitted to the balloon shape stay inside',
            target_lang='ENG', font_size=18)
        out = asyncio.run(dispatch_eng_render(img.copy(), img, [region]))
        changed = (out != img).any(axis=2)
        assert changed.any()
        # nothing rendered outside the balloon interior
        assert not (changed & ~inside).any()

    def test_no_dead_code(self):
        import inspect
        from manga_image_translator_tpu.rendering import text_render_eng
        src = inspect.getsource(text_render_eng)
        assert 'if False' not in src
        # extract_ballon_region is actually wired into the renderer
        body = inspect.getsource(text_render_eng.render_textblock_list_eng)
        assert 'extract_ballon_region' in body
