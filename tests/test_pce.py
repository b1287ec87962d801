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


def _sparse_truth(d=8, degree=3, s=8, seed=0, coeff_seed=11):
    """A ground-truth expansion with s random nonzero terms (constant
    always included)."""
    pce = PCE(d, degree)
    rng = np.random.default_rng(coeff_seed)
    c = np.zeros(pce.n_terms)
    c[0] = 1.5
    nz = rng.choice(np.arange(1, pce.n_terms), size=s - 1,
                    replace=False)
    c[nz] = rng.normal(0.0, 1.0, s - 1)
    truth = PCE(d, degree)
    truth.coefficients = jnp.asarray(c)[:, None]
    truth._scalar = True
    return truth, c


def test_sparse_recovery_underdetermined():
    """The compressive-sensing claim: s=8 active terms among P=165 are
    recovered EXACTLY (debiased, noiseless) from N=80 << P samples,
    where least squares is underdetermined and ridge smears energy."""
    truth, c = _sparse_truth()
    P = truth.n_terms
    assert P == 165
    theta = jax.random.normal(jax.random.key(1), (80, 8))
    y = truth(theta)
    pce = PCE(8, 3).fit_sparse(theta, y, seed=2)
    rec = np.asarray(pce.coefficients)[:, 0]
    assert np.max(np.abs(rec - c)) < 1e-6, np.max(np.abs(rec - c))
    assert pce.sparse_info["support_size"] <= 3 * 8
    # ridge at the same budget is nowhere close
    ridge = PCE(8, 3).fit_regression(theta, y, reg=1e-3)
    ridge_err = np.max(np.abs(np.asarray(ridge.coefficients)[:, 0] - c))
    assert ridge_err > 100 * np.max(np.abs(rec - c))
    # statistics flow through the sparse fit
    assert abs(pce.mean() - 1.5) < 1e-8
    assert abs(pce.var() - float(np.sum(c[1:] ** 2))) < 1e-6


def test_sparse_noisy_cv_beats_ridge():
    """With observation noise the CV-selected lambda still localizes
    the energy: surrogate RMSE on held-out points beats ridge at the
    same N << P budget."""
    truth, c = _sparse_truth(seed=1, coeff_seed=13)
    theta = jax.random.normal(jax.random.key(3), (100, 8))
    y = truth(theta) + 0.05 * jax.random.normal(jax.random.key(4),
                                                (100,))
    pce = PCE(8, 3).fit_sparse(theta, y, seed=5)
    ridge = PCE(8, 3).fit_regression(theta, y, reg=1e-2)
    t_test = jax.random.normal(jax.random.key(6), (2000, 8))
    y_test = truth(t_test)
    e_sparse = float(jnp.sqrt(jnp.mean((pce(t_test) - y_test) ** 2)))
    e_ridge = float(jnp.sqrt(jnp.mean((ridge(t_test) - y_test) ** 2)))
    assert e_sparse < 0.5 * e_ridge, (e_sparse, e_ridge)
    assert e_sparse < 0.1                      # near the noise floor


def test_sparse_explicit_lambda_and_validation():
    truth, c = _sparse_truth(d=3, degree=2, s=3)
    theta = jax.random.normal(jax.random.key(7), (40, 3))
    y = truth(theta)
    pce = PCE(3, 2).fit_sparse(theta, y, lam=1e-4)
    assert abs(pce.mean() - 1.5) < 1e-3
    with pytest.raises(ValueError, match="scalar"):
        PCE(3, 2).fit_sparse(theta, jnp.zeros((40, 2)))
    with pytest.raises(ValueError, match="n_folds"):
        PCE(3, 2).fit_sparse(theta, y, n_folds=1)


def test_control_variate_exact_surrogate_mean():
    """With the surrogate's mean exact from the coefficients, the CV
    estimator is unbiased and its measured variance reduction tracks
    1/(1 - rho^2) of the fit correlation."""
    from mlmc_tpu.pce import pce_control_variate

    a = jnp.asarray([0.6, 0.4, 0.2])
    f = lambda th: jnp.exp(a @ th)
    exact = float(np.exp(0.5 * float(a @ a)))
    theta = jax.random.normal(jax.random.key(0), (400, 3))
    pce = PCE(3, 4).fit_regression(theta, jax.vmap(f)(theta))
    res = pce_control_variate(f, pce, n=1 << 14, key=jax.random.key(1))
    assert abs(res["mean"] - exact) < 5 * res["se"] + 1e-6
    assert res["rho"] > 0.99
    assert res["var_reduction"] > 30.0, res
    # the CV se must be far below the plain-MC se at the same n_eval
    plain_se = np.sqrt(np.exp(2 * float(a @ a))
                       - np.exp(float(a @ a))) / np.sqrt(res["n_eval"])
    assert res["se"] < 0.3 * plain_se


def test_control_variate_validation():
    from mlmc_tpu.pce import pce_control_variate

    pce = PCE(2, 2)
    with pytest.raises(RuntimeError, match="fit"):
        pce_control_variate(lambda th: th[0], pce, 100)
    theta = jax.random.normal(jax.random.key(2), (50, 2))
    pce.fit_regression(theta, jnp.stack([theta[:, 0]] * 2, axis=1))
    with pytest.raises(ValueError, match="scalar"):
        pce_control_variate(lambda th: th[0], pce, 100)
    pce2 = PCE(2, 2).fit_regression(theta, theta[:, 0])
    with pytest.raises(ValueError, match="split"):
        pce_control_variate(lambda th: th[0], pce2, 100, split=1.5)
