"""Sobol' sensitivity indices: closed-form targets and estimator
properties. Beyond-reference capability (the reference has no
sensitivity analysis); validated against the Ishigami function — THE
standard benchmark with exact indices — and a linear-Gaussian model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.ops.sobol import normals_from_uniforms
from mlmc_tpu.sensitivity import sobol_indices

A_ISH, B_ISH = 7.0, 0.1


def ishigami(u):
    x = 2 * jnp.pi * u - jnp.pi            # U(-pi, pi)^3
    return (jnp.sin(x[:, 0]) + A_ISH * jnp.sin(x[:, 1]) ** 2
            + B_ISH * x[:, 2] ** 4 * jnp.sin(x[:, 0]))


def ishigami_exact():
    a, b = A_ISH, B_ISH
    v1 = 0.5 * (1 + b * np.pi ** 4 / 5) ** 2
    v2 = a ** 2 / 8
    v13 = 8 * b ** 2 * np.pi ** 8 / 225
    v = v1 + v2 + v13
    s = np.array([v1, v2, 0.0]) / v
    st = np.array([v1 + v13, v2, v13]) / v
    return s, st, v


def test_ishigami_closed_form():
    s_exact, st_exact, v_exact = ishigami_exact()
    res = sobol_indices(ishigami, dim=3, n=1 << 13, n_randomizations=8,
                        seed=4)
    np.testing.assert_allclose(res.first_order, s_exact, atol=5e-3)
    np.testing.assert_allclose(res.total_effect, st_exact, atol=5e-3)
    np.testing.assert_allclose(res.variance, v_exact, rtol=2e-3)
    # standard errors are calibrated: no index misses by > 6 se + slack
    assert np.all(np.abs(res.first_order - s_exact)
                  < 6 * res.first_order_se + 2e-3)
    assert np.all(np.abs(res.total_effect - st_exact)
                  < 6 * res.total_effect_se + 2e-3)
    assert res.n_evaluations == 8 * (1 << 13) * 5


def test_linear_gaussian_indices_and_transform():
    c = jnp.asarray([3.0, 2.0, 1.0, 0.0])
    exact = np.asarray(c) ** 2 / float(np.sum(np.asarray(c) ** 2))

    res = sobol_indices(lambda z: z @ c, dim=4, n=1 << 12,
                        n_randomizations=4, seed=1,
                        transform=normals_from_uniforms)
    np.testing.assert_allclose(res.first_order, exact, atol=4e-3)
    # additive model: total effects equal first-order ones
    np.testing.assert_allclose(res.total_effect, exact, atol=4e-3)
    np.testing.assert_allclose(res.mean, 0.0, atol=5e-3)
    # the dead factor's total effect is EXACTLY zero: f(A) == f(AB_3)
    # bit-identically when column 3 is dead (the Jansen first-order
    # estimator keeps O(1/n) sampling noise there by construction)
    assert res.total_effect[3] == 0.0


def test_interaction_only_model():
    """f = prod(2 u_i - 1): all first-order indices 0, totals 1 each at
    d=2 -> V_12 carries everything."""
    def fn(u):
        x = 2 * u - 1
        return x[:, 0] * x[:, 1]

    res = sobol_indices(fn, dim=2, n=1 << 12, n_randomizations=4, seed=2)
    np.testing.assert_allclose(res.first_order, [0.0, 0.0], atol=5e-3)
    np.testing.assert_allclose(res.total_effect, [1.0, 1.0], atol=5e-3)


def test_validation_errors():
    with pytest.raises(ValueError):
        sobol_indices(lambda u: u[:, 0], dim=0)
    with pytest.raises(ValueError):
        sobol_indices(lambda u: u[:, 0], dim=1, n_randomizations=1)
    with pytest.raises(ValueError):
        sobol_indices(lambda u: u[:, 0], dim=1, chunk_size=100)
    with pytest.raises(ValueError, match="variance"):
        sobol_indices(lambda u: jnp.zeros(u.shape[0]), dim=2, n=256,
                      n_randomizations=2)
    with pytest.raises(FloatingPointError):
        sobol_indices(lambda u: jnp.log(-u[:, 0]), dim=2, n=256,
                      n_randomizations=2)


def test_mlmc_sobol_indices_telescope_to_fine_model():
    """Two-level telescoped pick-freeze: a cheap surrogate carries the
    bulk and a small fine-correction design fixes it up — the result
    matches the FINE model's closed-form indices (Mycek & Le Maitre
    2019 estimator structure)."""
    from mlmc_tpu.sensitivity import sobol_indices_mlmc

    def coarse_model(u):
        # deliberately wrong b and a missing interaction term
        x = 2 * jnp.pi * u - jnp.pi
        return jnp.sin(x[:, 0]) + A_ISH * jnp.sin(x[:, 1]) ** 2

    def level0(u):
        y = coarse_model(u)
        return y, jnp.zeros_like(y)

    def level1(u):
        return ishigami(u), coarse_model(u)

    s_exact, st_exact, v_exact = ishigami_exact()
    res = sobol_indices_mlmc([level0, level1], dim=3,
                             n_per_level=[1 << 13, 1 << 11],
                             n_randomizations=8, seed=3)
    np.testing.assert_allclose(res.first_order, s_exact, atol=2e-2)
    np.testing.assert_allclose(res.total_effect, st_exact, atol=2e-2)
    np.testing.assert_allclose(res.variance, v_exact, rtol=2e-2)
    # the fine correction is a small fraction of the coarse bulk
    assert abs(res.level_terms["e_f2"][1]) < 0.5 * res.level_terms["e_f2"][0]
    # telescoped == single-level on the fine model, within joint error
    direct = sobol_indices(ishigami, dim=3, n=1 << 13,
                           n_randomizations=8, seed=3)
    np.testing.assert_allclose(res.first_order, direct.first_order,
                               atol=2e-2)

    with pytest.raises(ValueError):
        sobol_indices_mlmc([level0], dim=3, n_per_level=[64, 64])


def test_small_n_rounds_up_to_chunk_multiple():
    res = sobol_indices(ishigami, dim=3, n=100, n_randomizations=2,
                        seed=0, chunk_size=1 << 11)
    assert res.n == 128
    assert np.all(np.isfinite(res.first_order))


def test_active_subspace_ridge_function():
    """f(x) = g(w^T x) has a rank-1 gradient covariance whose top
    eigenvector IS w; activity scores rank inputs like w^2."""
    from mlmc_tpu.sensitivity import active_subspace
    w = np.array([3.0, -2.0, 0.5, 0.0, 1.0])
    w = w / np.linalg.norm(w)
    wj = jnp.asarray(w)

    def fn(x):
        s = wj @ x
        return jnp.tanh(s) + 0.1 * s ** 2

    out = active_subspace(fn, dim=5, n_samples=8192,
                          key=jax.random.key(0))
    lam = out["eigvals"]
    assert lam[0] > 1e3 * max(lam[1], 1e-300)
    v = out["W"][:, 0]
    assert np.abs(v @ w) > 0.9999
    assert out["explained"][0] > 0.999
    # activity scores proportional to w^2 (rank order preserved)
    order = np.argsort(-out["activity"])
    assert list(order[:3]) == list(np.argsort(-w ** 2)[:3])
    # split-half k=1 subspace is stable
    assert out["subspace_dist"][0] < 0.05
    with pytest.raises(ValueError, match="dim"):
        active_subspace(fn, dim=0)


def test_active_subspace_quadratic_closed_form():
    """f = x^T A x / 2 with x ~ N(0, I): grad = A x, C = A^2 — the
    eigenvalues of C are eigvals(A)^2 and the eigvecs are A's."""
    from mlmc_tpu.sensitivity import active_subspace
    rng = np.random.default_rng(1)
    Q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    a = np.array([4.0, 2.0, 1.0, 0.25])
    A = Q @ np.diag(a) @ Q.T
    Aj = jnp.asarray(A)

    def fn(x):
        return 0.5 * x @ (Aj @ x)

    out = active_subspace(fn, dim=4, n_samples=1 << 15,
                          key=jax.random.key(2))
    assert np.allclose(out["eigvals"], a ** 2, rtol=0.1)
    for i in range(4):
        assert abs(out["W"][:, i] @ Q[:, i]) > 0.95, i
