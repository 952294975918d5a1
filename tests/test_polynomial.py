"""Tests for the batched polynomial solvers — mirrors the spec of the
reference's closed_form_polynomial_solver and find_polynomial_roots tests."""

import jax.numpy as jnp
import numpy as np

from pytheiasfm_tpu.ops import polynomial as poly


def _check_roots(found, valid, expected, atol=1e-8):
    found = np.asarray(found)[np.asarray(valid)]
    found = np.sort(found)
    expected = np.sort(np.asarray(expected))
    assert len(found) == len(expected), (found, expected)
    np.testing.assert_allclose(found, expected, atol=atol)


def test_quadratic_two_roots():
    # (x-3)(x+5) = x^2 + 2x - 15
    roots, valid = poly.solve_quadratic(1.0, 2.0, -15.0)
    _check_roots(roots, valid, [3.0, -5.0])


def test_quadratic_no_real_roots():
    _, valid = poly.solve_quadratic(1.0, 0.0, 1.0)
    assert not np.any(np.asarray(valid))


def test_quadratic_cancellation():
    # x^2 - 1e8 x + 1 — naive formula loses the small root in f64.
    roots, valid = poly.solve_quadratic(1.0, -1e8, 1.0)
    found = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(found[0], 1e-8, rtol=1e-10)
    np.testing.assert_allclose(found[1], 1e8, rtol=1e-10)


def test_cubic_three_roots():
    # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
    roots, valid = poly.solve_cubic(1.0, -6.0, 11.0, -6.0)
    _check_roots(roots, valid, [1.0, 2.0, 3.0])


def test_cubic_one_root():
    # (x-2)(x^2+1) = x^3 - 2x^2 + x - 2
    roots, valid = poly.solve_cubic(1.0, -2.0, 1.0, -2.0)
    _check_roots(roots, valid, [2.0])


def test_quartic_four_roots():
    # (x-1)(x+1)(x-2)(x+3) = x^4 + x^3 - 7x^2 - x + 6
    roots, valid = poly.solve_quartic(1.0, 1.0, -7.0, -1.0, 6.0)
    _check_roots(roots, valid, [1.0, -1.0, 2.0, -3.0], atol=1e-7)


def test_quartic_two_roots():
    # (x-1)(x-2)(x^2+1) = x^4 - 3x^3 + 3x^2 - 3x + 2
    roots, valid = poly.solve_quartic(1.0, -3.0, 3.0, -3.0, 2.0)
    _check_roots(roots, valid, [1.0, 2.0], atol=1e-7)


def test_quartic_batched(rng):
    # Random quartics with known real roots.
    r = rng.uniform(-5, 5, size=(32, 4))
    r.sort(axis=-1)
    # Expand (x-r0)(x-r1)(x-r2)(x-r3).
    coeffs = np.stack([np.poly(ri) for ri in r])
    roots, valid = poly.solve_quartic(*[jnp.asarray(coeffs[:, i]) for i in range(5)])
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.sort(np.asarray(roots), axis=-1), r, atol=1e-5)


def test_generic_root_finder_degree10(rng):
    """The five-point solver's use case: degree-10 with a handful of real
    roots. Mirrors find_polynomial_roots_companion_matrix_test expectations."""
    for _ in range(8):
        real_roots = rng.uniform(-10, 10, size=4)
        # Multiply in 3 complex-conjugate quadratic factors (no real roots).
        coeffs = np.array([1.0])
        for r in real_roots:
            coeffs = np.convolve(coeffs, [1.0, -r])
        for _ in range(3):
            b = rng.uniform(-2, 2)
            c = b * b / 4 + rng.uniform(0.5, 3.0)
            coeffs = np.convolve(coeffs, [1.0, b, c])
        assert len(coeffs) == 11
        roots, valid = poly.find_real_polynomial_roots(jnp.asarray(coeffs))
        _check_roots(roots, valid, np.sort(real_roots), atol=1e-6)


def test_generic_root_finder_batched(rng):
    coeffs = []
    expected = []
    for _ in range(16):
        r = rng.uniform(-3, 3, size=3)
        coeffs.append(np.poly(r))
        expected.append(np.sort(r))
    roots, valid = poly.find_real_polynomial_roots(jnp.asarray(np.stack(coeffs)))
    for i in range(16):
        _check_roots(roots[i], valid[i], expected[i], atol=1e-7)


def test_generic_root_finder_large_magnitude():
    # Root at 1e4 — tests the tan-grid covering large values.
    coeffs = np.poly([1e4, -2.0])
    roots, valid = poly.find_real_polynomial_roots(jnp.asarray(coeffs))
    found = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(found, [-2.0, 1e4], rtol=1e-5)


def test_polyval():
    coeffs = jnp.asarray([2.0, -3.0, 1.0])  # 2x^2 - 3x + 1
    np.testing.assert_allclose(
        np.asarray(poly.polyval(coeffs, jnp.asarray([0.0, 1.0, 2.0]))),
        [1.0, 0.0, 3.0],
    )
