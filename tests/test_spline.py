"""Catmull-Rom spline tests (the evaluate the reference stubbed,
src/spline.inl:6-22)."""

import numpy as np

from cuda_raytracer_tpu.scene.spline import Spline, cubic_spline_unit_interval


def test_interpolates_knots():
    s = Spline()
    s.set_value(0.0, [0.0, 0.0, 0.0])
    s.set_value(1.0, [1.0, 2.0, 3.0])
    s.set_value(2.0, [0.0, 0.0, 1.0])
    for t, v in [(0.0, [0, 0, 0]), (1.0, [1, 2, 3]), (2.0, [0, 0, 1])]:
        np.testing.assert_allclose(s.evaluate(t), v, atol=1e-12)


def test_clamps_outside_range():
    s = Spline()
    s.set_value(1.0, [2.0])
    s.set_value(2.0, [4.0])
    np.testing.assert_allclose(s.evaluate(0.0), [2.0])
    np.testing.assert_allclose(s.evaluate(5.0), [4.0])


def test_linear_for_two_knots():
    s = Spline()
    s.set_value(0.0, [0.0])
    s.set_value(1.0, [1.0])
    # mirrored boundary tangents give exact linear interpolation
    np.testing.assert_allclose(s.evaluate(0.5), [0.5], atol=1e-12)


def test_continuity():
    s = Spline()
    for t, v in [(0, 0.0), (1, 1.0), (2, -1.0), (3, 0.5)]:
        s.set_value(float(t), [v])
    eps = 1e-6
    for knot in (1.0, 2.0):
        left = s.evaluate(knot - eps)[0]
        right = s.evaluate(knot + eps)[0]
        assert abs(left - right) < 1e-4


def test_hermite_basis_partition():
    # h00 + h01 = 1 at any t when tangents are zero
    for t in np.linspace(0, 1, 11):
        v = cubic_spline_unit_interval([1.0], [1.0], [1.0], [1.0], t)
        np.testing.assert_allclose(v, [1.0], atol=1e-12)


def test_remove_knot():
    s = Spline()
    s.set_value(1.0, [5.0])
    assert s.remove_knot(1.0005)
    assert not s.remove_knot(1.0)
    assert s.evaluate(1.0, default=[0.0])[0] == 0.0
