"""Polynomial chaos tests: exact recovery of polynomial truths
(coefficients, mean, variance, Sobol' groups all closed-form),
regression/projection agreement, Ishigami sensitivity parity with the
pick-freeze estimator's closed form, convergence on an analytic
non-polynomial, and surrogate semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.pce import PCE, total_degree_indices

A_ISH, B_ISH = 7.0, 0.1


def _poly(th):
    """2 + th0 - 3 th0 th1 + 0.5 th2^2: Hermite-exact at degree 3."""
    return 2.0 + th[0] - 3.0 * th[0] * th[1] + 0.5 * th[2] ** 2


def test_index_set():
    idx = total_degree_indices(3, 2)
    assert len(idx) == 10                     # C(5, 2)
    assert (idx.sum(axis=1) <= 2).all()
    assert len(np.unique(idx, axis=0)) == 10


def test_hermite_regression_exact_polynomial():
    """Degree-3 Hermite PCE recovers a degree-2 polynomial exactly:
    mean = 2.5 (th^2 = He2 + 1), var = 1 + 9 + 0.5 = 10.5, and the
    Sobol groups are the coefficient shares."""
    pce = PCE(3, 3, basis="hermite")
    theta = jax.random.normal(jax.random.key(0), (800, 3))
    y = jax.vmap(_poly)(theta)
    pce.fit_regression(theta, y)
    assert abs(pce.mean() - 2.5) < 1e-9
    assert abs(pce.var() - 10.5) < 1e-8
    sob = pce.sobol()
    np.testing.assert_allclose(
        sob["first_order"], [1 / 10.5, 0.0, 0.5 / 10.5], atol=1e-9)
    np.testing.assert_allclose(
        sob["total_effect"], [10 / 10.5, 9 / 10.5, 0.5 / 10.5],
        atol=1e-9)
    # the surrogate IS the function (both polynomials of degree <= 3)
    probe = jax.random.normal(jax.random.key(1), (64, 3))
    np.testing.assert_allclose(np.asarray(pce(probe)),
                               np.asarray(jax.vmap(_poly)(probe)),
                               atol=1e-8)
    # single-sample call squeezes to a scalar
    assert np.ndim(pce(jnp.zeros(3))) == 0


def test_projection_matches_regression():
    """Spectral projection on a level-3 GH grid (exact to degree 7 >=
    2 + 3) lands on the same coefficients as regression."""
    reg = PCE(3, 3).fit_regression(
        jax.random.normal(jax.random.key(2), (500, 3)),
        jax.vmap(_poly)(jax.random.normal(jax.random.key(2), (500, 3))))
    proj = PCE(3, 3).fit_projection(_poly, level=3)
    np.testing.assert_allclose(np.asarray(proj.coefficients),
                               np.asarray(reg.coefficients), atol=1e-8)


def test_ishigami_sobol_closed_form():
    """Legendre PCE at degree 12 reproduces the Ishigami indices —
    cross-validates the sampling pick-freeze estimator
    (tests/test_sensitivity.py) with a zero-sampling-error method."""
    a, b = A_ISH, B_ISH
    v1 = 0.5 * (1 + b * np.pi ** 4 / 5) ** 2
    v2 = a ** 2 / 8
    v13 = 8 * b ** 2 * np.pi ** 8 / 225
    v = v1 + v2 + v13
    s_exact = np.array([v1, v2, 0.0]) / v
    st_exact = np.array([v1 + v13, v2, v13]) / v

    def ishigami(x):                      # x ~ U(-1,1)^3 -> U(-pi,pi)
        z = np.pi * x
        return (jnp.sin(z[0]) + a * jnp.sin(z[1]) ** 2
                + b * z[2] ** 4 * jnp.sin(z[0]))

    pce = PCE(3, 12, basis="legendre")
    x = jax.random.uniform(jax.random.key(3), (4096, 3),
                           minval=-1.0, maxval=1.0)
    pce.fit_regression(x, jax.vmap(ishigami)(x))
    sob = pce.sobol()
    np.testing.assert_allclose(sob["first_order"], s_exact, atol=2e-3)
    np.testing.assert_allclose(sob["total_effect"], st_exact, atol=2e-3)
    assert abs(sob["variance"] - v) / v < 5e-3
    assert abs(sob["mean"] - a / 2) < 2e-3       # E[sin^2] = 1/2


def test_projection_convergence_analytic():
    """E/Var of the lognormal exp(0.5 theta): degree-8 projection on a
    rich 1-D grid nails the closed forms."""
    s = 0.5
    pce = PCE(1, 8).fit_projection(lambda th: jnp.exp(s * th[0]),
                                   level=12)
    assert abs(pce.mean() - np.exp(s * s / 2)) < 1e-7
    assert abs(pce.var() - (np.exp(2 * s * s) - np.exp(s * s))) < 1e-6


def test_vector_qoi_and_custom_indices():
    pce = PCE(2, 2)
    theta = jax.random.normal(jax.random.key(4), (200, 2))
    y = jnp.stack([theta[:, 0], theta[:, 1] ** 2], axis=1)
    pce.fit_regression(theta, y)
    np.testing.assert_allclose(pce.mean(), [0.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(pce.var(), [1.0, 2.0], atol=1e-8)
    assert pce(theta).shape == (200, 2)
    # custom index set WITHOUT the constant term: mean falls to 0
    custom = PCE(1, 1, indices=np.array([[1]]))
    custom.fit_regression(jax.random.normal(jax.random.key(5), (50, 1)),
                          jnp.ones(50))
    assert custom.mean() == 0.0


def test_validation():
    with pytest.raises(ValueError, match="basis"):
        PCE(2, 2, basis="laguerre")
    with pytest.raises(ValueError, match="N >= P"):
        PCE(3, 3).fit_regression(jnp.zeros((5, 3)), jnp.zeros(5))
    with pytest.raises(RuntimeError, match="fit"):
        PCE(2, 1).mean()
