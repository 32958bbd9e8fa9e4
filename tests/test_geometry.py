import numpy as np
import pytest

from manga_image_translator_tpu.utils.geometry import (
    Quadrilateral,
    can_merge_textline,
    convex_area,
    convex_polygon_distance,
    point_segment_distance,
    segment_distance,
    sort_points,
)


def quad(x, y, w, h, **kw):
    pts = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
    return Quadrilateral(pts, kw.pop('text', ''), kw.pop('prob', 1.0), **kw)


class TestSortPoints:
    def test_horizontal_box(self):
        pts = np.array([[10, 0], [0, 0], [10, 4], [0, 4]])
        out, vertical = sort_points(pts)
        assert not vertical
        np.testing.assert_array_equal(
            out, [[0, 0], [10, 0], [10, 4], [0, 4]])

    def test_vertical_box(self):
        pts = np.array([[0, 10], [4, 0], [0, 0], [4, 10]])
        out, vertical = sort_points(pts)
        assert vertical
        np.testing.assert_array_equal(
            out, [[0, 0], [4, 0], [4, 10], [0, 10]])

    def test_rotated_box_keeps_canonical_order(self):
        base = np.array([[0, 0], [20, 0], [20, 6], [0, 6]], dtype=np.float64)
        theta = np.deg2rad(20)
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        rot = base @ R.T + 50
        shuffled = rot[[2, 0, 3, 1]]
        out, vertical = sort_points(shuffled)
        assert not vertical
        np.testing.assert_allclose(out, rot, atol=1e-6)


class TestDistances:
    def test_point_segment(self):
        assert point_segment_distance([0, 1], [0, 0], [2, 0]) == pytest.approx(1)
        assert point_segment_distance([-1, 0], [0, 0], [2, 0]) == pytest.approx(1)
        assert point_segment_distance([3, 4], [0, 0], [0, 0]) == pytest.approx(5)

    def test_segment_intersecting(self):
        assert segment_distance([0, 0], [2, 2], [0, 2], [2, 0]) == 0

    def test_segment_parallel(self):
        assert segment_distance([0, 0], [2, 0], [0, 1], [2, 1]) == pytest.approx(1)

    def test_polygon_distance_overlapping(self):
        a = np.array([[0, 0], [4, 0], [4, 4], [0, 4]])
        b = a + 2
        assert convex_polygon_distance(a, b) == 0

    def test_polygon_distance_nested(self):
        a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
        b = np.array([[4, 4], [6, 4], [6, 6], [4, 6]])
        assert convex_polygon_distance(a, b) == 0

    def test_polygon_distance_separated(self):
        a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]])
        b = np.array([[5, 0], [7, 0], [7, 2], [5, 2]])
        assert convex_polygon_distance(a, b) == pytest.approx(3)

    def test_polygon_distance_diagonal(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]])
        b = np.array([[4, 4], [5, 4], [5, 5], [4, 5]])
        assert convex_polygon_distance(a, b) == pytest.approx(np.hypot(3, 3))

    def test_convex_area(self):
        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]])
        assert convex_area(sq) == pytest.approx(16)


class TestQuadrilateral:
    def test_direction_horizontal(self):
        q = quad(0, 0, 100, 20)
        assert q.direction == 'h'
        assert q.font_size == pytest.approx(20)
        assert q.aspect_ratio == pytest.approx(5)

    def test_direction_vertical(self):
        q = quad(0, 0, 20, 100)
        assert q.direction == 'v'
        assert q.font_size == pytest.approx(20)

    def test_aabb(self):
        q = quad(5, 7, 10, 4)
        assert (q.aabb.x, q.aabb.y, q.aabb.w, q.aabb.h) == (5, 7, 10, 4)
        assert q.xyxy == (5, 7, 15, 11)

    def test_valid(self):
        assert quad(0, 0, 50, 10).valid

    def test_angle_axis_aligned(self):
        q = quad(0, 0, 50, 10)
        assert q.is_axis_aligned
        assert q.is_approximate_axis_aligned

    def test_transformed_region_shape(self):
        img = np.random.randint(0, 255, (100, 200, 3), dtype=np.uint8)
        q = quad(10, 20, 80, 16)
        region = q.get_transformed_region(img, 'h', 48)
        assert region.shape[0] == 48
        assert region.shape[1] == pytest.approx(48 * 80 / 16, abs=2)

    def test_transformed_region_vertical_rotated(self):
        img = np.random.randint(0, 255, (300, 100, 3), dtype=np.uint8)
        q = quad(10, 20, 16, 200)
        region = q.get_transformed_region(img, 'v', 48)
        # vertical lines are rotated to read horizontally
        assert region.shape[0] == 48
        assert region.shape[1] > region.shape[0]

    def test_centroid(self):
        q = quad(0, 0, 10, 10)
        np.testing.assert_allclose(q.centroid, [5, 5])


class TestMergePredicate:
    def test_adjacent_horizontal_lines_merge(self):
        a = quad(0, 0, 100, 16)
        b = quad(0, 20, 100, 16)
        assert can_merge_textline(a, b)

    def test_distant_lines_do_not_merge(self):
        a = quad(0, 0, 100, 16)
        b = quad(0, 300, 100, 16)
        assert not can_merge_textline(a, b)

    def test_font_size_mismatch_rejected(self):
        a = quad(0, 0, 100, 10)
        b = quad(0, 15, 100, 40)
        assert not can_merge_textline(a, b)

    def test_vertical_columns_merge(self):
        a = quad(100, 0, 16, 120)
        b = quad(80, 0, 16, 120)
        assert can_merge_textline(a, b)

    def test_mixed_aspect_rejected(self):
        a = quad(0, 0, 200, 16)   # wide horizontal
        b = quad(210, 0, 16, 200)  # tall vertical
        assert not can_merge_textline(a, b)


class TestTextBlock:
    def test_cjk_join(self):
        from manga_image_translator_tpu.utils.textblock import TextBlock
        lines = [[[0, 0], [10, 0], [10, 10], [0, 10]]] * 2
        blk = TextBlock(lines, texts=['こんに', 'ちは'])
        assert blk.text == 'こんにちは'
        blk2 = TextBlock(lines, texts=['hello', 'world'])
        assert blk2.text == 'hello world'

    def test_direction_from_lines(self):
        from manga_image_translator_tpu.utils.textblock import TextBlock
        tall = [[[0, 0], [10, 0], [10, 100], [0, 100]]]
        blk = TextBlock(tall, texts=['a'])
        assert blk.direction == 'v'
        wide = [[[0, 0], [100, 0], [100, 10], [0, 10]]]
        blk = TextBlock(wide, texts=['a'])
        assert blk.direction == 'h'

    def test_rtl_render_text(self):
        from manga_image_translator_tpu.utils.textblock import TextBlock
        lines = [[[0, 0], [10, 0], [10, 10], [0, 10]]]
        blk = TextBlock(lines, texts=['x'], translation='مرحبا abc 123',
                        direction='hr')
        out = blk.get_translation_for_rendering()
        assert 'cba' in out or '321' in out  # LTR runs reversed

    def test_font_color_adjustment(self):
        from manga_image_translator_tpu.utils.textblock import TextBlock
        lines = [[[0, 0], [10, 0], [10, 10], [0, 10]]]
        blk = TextBlock(lines, texts=['x'], fg_color=(10, 10, 10),
                        bg_color=(12, 12, 12))
        fg, bg = blk.get_font_colors()
        assert tuple(bg) == (255, 255, 255)  # dark-on-dark pushed to white
