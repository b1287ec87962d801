"""Moment-basis tests: closed forms, numpy cross-checks, clipping, transforms.

Mirrors reference test/test_moments.py plus stricter numpy.polynomial parity
and jit/vmap usability checks.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.moments import Monomial, Fourier, Legendre, TransformedMoments, legvander


def test_monomials():
    size = 5
    values = np.array([-2, -1, -0.5, 0, 0.5, 1, 2], dtype=float)
    ref = [values ** r for r in range(size)]

    moments_fn = Monomial(size, safe_eval=False)
    moments = np.asarray(moments_fn(values))
    assert np.allclose(np.array(ref).T, moments)

    a, b = (-1, 3)
    moments_fn = Monomial(size, (a, b), safe_eval=False)
    moments = np.asarray(moments_fn((b - a) * values + a))
    assert np.allclose(np.array(ref).T, moments)

    values = np.random.randn(1000)
    moments_fn = Monomial(2, safe_eval=False)
    moments = np.asarray(moments_fn(values))
    assert np.abs(np.mean(moments[:, 1])) < 0.1


def test_fourier():
    size = 6
    moments_fn = Fourier(size, (0, 1))
    values = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    values_ = 2 * np.pi * values
    ref = [
        np.ones_like(values_),
        np.cos(values_),
        np.sin(values_),
        np.cos(2 * values_),
        np.sin(2 * values_),
        np.cos(3 * values_),
    ]
    moments = np.asarray(moments_fn(values))
    assert np.allclose(np.array(ref).T, moments)

    a, b = (-1, 3)
    moments_fn = Fourier(size, (a, b))
    moments = np.asarray(moments_fn((b - a) * values + a))
    assert np.allclose(np.array(ref).T, moments)


def test_legendre():
    size = 4
    moments_fn = Legendre(size, (-1.0, 1.0))
    values = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    moments = np.asarray(moments_fn(values))
    ref = [
        np.ones_like(values),
        values,
        (3 * values ** 2 - 1.0) / 2.0,
        (5 * values ** 3 - 3 * values) / 2.0,
    ]
    assert np.allclose(np.array(ref).T, moments)


def test_legvander_matches_numpy():
    """Recurrence parity with numpy.polynomial.legendre.legvander.

    XLA FMA contraction perturbs the last bits; 1e-12 is far below the
    1e-10 parity budget.
    """
    x = np.random.RandomState(0).uniform(-1, 1, size=1000)
    for deg in (1, 5, 24, 34):
        ours = np.asarray(legvander(jnp.asarray(x), deg))
        ref = np.polynomial.legendre.legvander(x, deg)
        assert np.abs(ours - ref).max() < 1e-12


def test_safe_eval_clipping():
    """Out-of-domain values become NaN lanes (reference moments.py:58-67)."""
    moments_fn = Legendre(3, (0.0, 1.0), safe_eval=True)
    vals = np.array([-0.5, 0.0, 0.5, 1.0, 1.5])
    moments = np.asarray(moments_fn(vals))
    assert np.all(np.isnan(moments[0]))
    assert np.all(np.isnan(moments[4]))
    assert np.all(np.isfinite(moments[1:4]))


def test_log_transform():
    moments_fn = Legendre(3, (np.exp(0.0), np.exp(1.0)), log=True, safe_eval=False)
    # log then linear maps [1, e] -> [-1, 1]
    vals = np.exp(np.array([0.0, 0.5, 1.0]))
    t = np.asarray(moments_fn.transform(vals))
    assert np.allclose(t, [-1.0, 0.0, 1.0])
    back = np.asarray(moments_fn.inv_transform(t))
    assert np.allclose(back, vals)


def test_eval_diff_matches_reference_construction():
    """vander @ diff_mat equals derivative of Legendre polys."""
    size = 6
    moments_fn = Legendre(size, (-1.0, 1.0), safe_eval=False)
    x = np.linspace(-0.9, 0.9, 7)
    ours = np.asarray(moments_fn.eval_diff(x))
    ref = np.empty((len(x), size))
    for s in range(size):
        coef = np.zeros(s + 1)
        coef[-1] = 1
        dcoef = np.polynomial.legendre.legder(coef, 1)
        ref[:, s] = np.polynomial.legendre.legval(x, dcoef)
    assert np.allclose(ours, ref, atol=1e-12)

    ours2 = np.asarray(moments_fn.eval_all_der(x, degree=2))
    ref2 = np.empty((len(x), size))
    for s in range(size):
        coef = np.zeros(s + 1)
        coef[-1] = 1
        dcoef = np.polynomial.legendre.legder(coef, 2)
        ref2[:, s] = np.polynomial.legendre.legval(x, dcoef)
    assert np.allclose(ours2, ref2, atol=1e-10)


def test_transform_moments():
    size = 5
    domain = [-1.0, 1.0]
    values = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    moments_fn = Legendre(size, domain, log=False, safe_eval=True)

    matrix = np.eye(size)
    transformed = TransformedMoments(moments_fn, matrix)
    mom = np.asarray(moments_fn(values))
    trans_mom = np.asarray(transformed(values))
    assert np.allclose(mom, trans_mom)

    matrix = np.triu(np.ones((size, size)))
    transformed = TransformedMoments(moments_fn, matrix)
    trans_mom = np.asarray(transformed(values))
    assert np.allclose(np.matmul(mom, matrix.T), trans_mom)


def test_jit_vmap_usable():
    """eval_all must be jittable and vmappable (device hot path)."""
    moments_fn = Legendre(25, (-3.0, 3.0), safe_eval=True)

    @jax.jit
    def f(x):
        return moments_fn.eval_all(x)

    x = jnp.linspace(-2, 2, 64).reshape(8, 8)
    out = f(x)
    assert out.shape == (8, 8, 25)
    ref = np.polynomial.legendre.legvander(np.asarray(moments_fn.transform(x)), 24)
    assert np.allclose(np.asarray(out), ref, atol=1e-12)

    vm = jax.vmap(moments_fn.eval_all)(x)
    assert np.allclose(np.asarray(vm), np.asarray(out), atol=1e-14)


def test_eval_single_and_change_size():
    moments_fn = Legendre(8, (-1, 1), safe_eval=False)
    x = np.linspace(-1, 1, 5)
    m3 = np.asarray(moments_fn.eval_single_moment(3, x))
    ref = np.polynomial.legendre.legvander(x, 7)[:, 3]
    assert np.allclose(m3, ref)

    smaller = moments_fn.change_size(4)
    assert smaller.size == 4
    assert smaller == Legendre(4, (-1, 1), safe_eval=False)
    assert smaller != moments_fn
