"""Sparse-grid collocation tests: Novak-Ritter polynomial exactness,
spectral convergence on analytic integrands with Gaussian/uniform
closed forms, Clenshaw-Curtis nestedness economics, the one-pass
variance, and the multilevel telescope."""
import numpy as np
import jax.numpy as jnp
import pytest

from mlmc_tpu.collocation import (AdaptiveSparseGrid, SparseGrid,
                                  multilevel_collocation)


def _gauss_moment(k):
    """E[theta^k] for theta ~ N(0,1)."""
    if k % 2:
        return 0.0
    return float(np.prod(np.arange(k - 1, 0, -2))) if k else 1.0


def test_gauss_hermite_polynomial_exactness():
    """Novak-Ritter: the linear-growth GH Smolyak rule at level w is
    exact for total degree 2w+1 — checked on every monomial of total
    degree <= 5 at w=2, d=3."""
    grid = SparseGrid(3, 2, rule="gauss-hermite")
    assert abs(grid.weights.sum() - 1.0) < 1e-12
    for a in range(6):
        for b in range(6 - a):
            for c in range(6 - a - b):
                exact = (_gauss_moment(a) * _gauss_moment(b)
                         * _gauss_moment(c))
                got = float(grid.integrate(
                    lambda th, a=a, b=b, c=c:
                    th[0] ** a * th[1] ** b * th[2] ** c))
                assert abs(got - exact) < 1e-10, (a, b, c, got, exact)


def test_gauss_hermite_spectral_convergence():
    """E[exp(a.theta)] = exp(|a|^2/2): analytic, so the error must fall
    spectrally with the level (and beat MC by many orders at the same
    evaluation count)."""
    d = 5
    a = 0.3 * np.arange(1, d + 1) / d
    exact = np.exp(0.5 * np.dot(a, a))
    aj = jnp.asarray(a)
    errs, counts = [], []
    for w in (1, 3, 5):
        grid = SparseGrid(d, w, rule="gauss-hermite")
        got = float(grid.integrate(lambda th: jnp.exp(aj @ th)))
        errs.append(abs(got - exact))
        counts.append(grid.n_nodes)
    assert errs[2] < 1e-9
    assert errs[2] < 1e-4 * errs[0]
    assert counts[2] < 5000                     # vs 6^5 = 7776 tensor


def test_clenshaw_curtis_uniform_closed_form():
    """E[cos(c.x)] over U[-1,1]^d = prod sin(c_k)/c_k; the nested CC
    grid stays tiny next to the full tensor."""
    d = 4
    c = np.array([0.9, 1.7, 0.4, 1.2])
    exact = float(np.prod(np.sin(c) / c))
    cj = jnp.asarray(c)
    grid = SparseGrid(d, 6, rule="clenshaw-curtis")
    got = float(grid.integrate(lambda x: jnp.cos(cj @ x)))
    assert abs(got - exact) < 1e-6          # measured 5.8e-8 at w=6
    fine = SparseGrid(d, 8, rule="clenshaw-curtis")
    got8 = float(fine.integrate(lambda x: jnp.cos(cj @ x)))
    assert abs(got8 - exact) < 1e-10        # measured 5e-12 at w=8
    assert abs(grid.weights.sum() - 1.0) < 1e-12
    assert grid.n_nodes < 0.01 * grid.n_tensor  # nested sparsity


def test_gauss_legendre_moments():
    grid = SparseGrid(2, 3, rule="gauss-legendre")
    assert abs(float(grid.integrate(lambda x: x[0] ** 2)) - 1 / 3) < 1e-12
    assert abs(float(grid.integrate(
        lambda x: x[0] ** 2 * x[1] ** 4)) - 1 / 15) < 1e-12


def test_mean_and_var_one_pass():
    """Var[exp(a theta)] = e^{2a^2} - e^{a^2} (lognormal), via the
    (f, f^2) single pass; vector QoI shape preserved."""
    a = 0.4
    grid = SparseGrid(1, 8, rule="gauss-hermite")
    mean, var = grid.mean_and_var(
        lambda th: jnp.stack([jnp.exp(a * th[0]), th[0]]))
    assert abs(mean[0] - np.exp(0.5 * a * a)) < 1e-10
    assert abs(var[0] - (np.exp(2 * a * a) - np.exp(a * a))) < 1e-8
    assert abs(mean[1]) < 1e-12 and abs(var[1] - 1.0) < 1e-10


def test_multilevel_collocation_telescope():
    """MLSC in its regime — corrections of LOW effective degree on a
    harder analytic base: with levels [5, 3, 2], the telescope matches
    the all-fine level-5 collocation while evaluating the fine model
    only on the 41-node level-2 grid (vs 953), and crushes the direct
    level-2 answer at the same fine-model budget."""
    d = 4
    a = np.array([1.0, 0.7, 0.4, 0.9])
    aj = jnp.asarray(a)
    exact = float(np.exp(0.5 * a @ a)) + 2.0 ** -4   # E[th0^2 th1^2]=1

    def make(lvl):
        eps = 2.0 ** -(2 * lvl)
        return lambda th: (jnp.exp(aj @ th)
                           + eps * th[0] ** 2 * th[1] ** 2)

    fns = [make(0), make(1), make(2)]
    out = multilevel_collocation(fns, d, levels=[5, 3, 2])
    err_ml = abs(float(np.atleast_1d(out["mean"])[0]) - exact)
    err_w5 = abs(float(np.atleast_1d(
        SparseGrid(d, 5).integrate(fns[-1]))[0]) - exact)
    err_w2 = abs(float(np.atleast_1d(
        SparseGrid(d, 2).integrate(fns[-1]))[0]) - exact)
    # same accuracy as all-fine level 5 (corrections are exact at w>=2)
    assert err_ml < 1.05 * err_w5 + 1e-12
    # >10x better than spending the same fine budget directly
    assert err_ml < 0.1 * err_w2
    # corrections shrink with the model-difference amplitude
    mags = [abs(float(np.atleast_1d(cc)[0])) for cc in out["corrections"]]
    assert mags[2] < mags[1] < mags[0]
    assert out["n_nodes"][2] < 0.1 * out["n_nodes_single"]


def test_multilevel_scalar_shapes_uniform():
    """Scalar fns: every correction (including level 0) is [1]-shaped
    and the mean is [1] regardless of L."""
    fn = lambda th: jnp.exp(0.2 * th[0])
    one = multilevel_collocation([fn], 2, levels=[3])
    two = multilevel_collocation([fn, fn], 2, levels=[3, 2])
    assert np.shape(one["mean"]) == (1,) == np.shape(two["mean"])
    assert all(np.shape(c) == (1,) for c in one["corrections"])
    assert all(np.shape(c) == (1,) for c in two["corrections"])
    assert abs(float(two["mean"][0] - one["mean"][0])) < 1e-12
    assert two["n_nodes_single"] == one["n_nodes"][0]


def test_validation():
    with pytest.raises(ValueError, match="rule"):
        SparseGrid(2, 2, rule="monte-carlo")
    with pytest.raises(ValueError, match="d >= 1"):
        SparseGrid(0, 2)
    with pytest.raises(ValueError, match="per model"):
        multilevel_collocation([lambda th: th[0]], 2, levels=[1, 2])


def _downward_closed(indices):
    s = set(indices)
    return all(
        tuple(i[m] - (m == k) for m in range(len(i))) in s
        for i in s for k in range(len(i)) if i[k] > 1)


def test_adaptive_polynomial_terminates_exact():
    """On a polynomial the hierarchical surpluses vanish beyond the
    exactness degree, so the adaptive loop converges (frontier
    indicator 0) at the exact Gaussian moments."""
    grid = AdaptiveSparseGrid(2, rule="gauss-hermite")
    fn = lambda th: th[0] ** 4 + th[0] ** 2 * th[1] ** 2
    # min_level=2 probes the mixed (2,2) index whose PARENT surpluses
    # both vanish by symmetry — the documented greedy blind spot
    res = grid.integrate(fn, tol=1e-12, max_evals=2000, min_level=2)
    assert res["converged"]
    assert abs(res["mean"] - (3.0 + 1.0)) < 1e-10
    assert _downward_closed(res["indices"])
    assert res["history"][0][0] == (1, 1)       # root accepted first
    # the default greedy run demonstrates the blind spot honestly: it
    # converges on the separable part and misses the hidden mixed term
    res1 = grid.integrate(fn, tol=1e-12, max_evals=2000)
    assert abs(res1["mean"] - 3.0) < 1e-10


def test_adaptive_anisotropic_beats_isotropic():
    """Strongly anisotropic analytic integrand in d=8: the adaptive
    grid must reach BETTER accuracy than the isotropic Smolyak level-3
    band while spending fewer evaluations — the whole point of
    dimension adaptivity."""
    d = 8
    c = 2.0 ** -np.arange(d)
    exact = float(np.exp(0.5 * c @ c))
    cj = jnp.asarray(c)
    fn = lambda th: jnp.exp(cj @ th)
    iso = SparseGrid(d, 3, rule="gauss-hermite")
    iso_err = abs(float(iso.integrate(fn)) - exact)
    res = AdaptiveSparseGrid(d).integrate(fn, tol=1e-10,
                                          max_evals=iso.n_nodes)
    err = abs(res["mean"] - exact)
    # measured: 4.4e-5 vs isotropic 4.1e-3 at the same budget (93x)
    assert err < 0.05 * iso_err, (err, iso_err)
    assert res["n_evals"] < 1.2 * iso.n_nodes   # soft cap overshoot
    # refinement depth follows the anisotropy: dim 0 deepest
    depth = np.max(np.array(res["indices"]), axis=0)
    assert depth[0] == depth.max() and depth[0] >= depth[1] >= depth[-1]
    assert _downward_closed(res["indices"])


def test_adaptive_error_estimate_and_budget():
    """The summed frontier indicator tracks the true error within a
    modest factor, and the eval budget is respected (soft cap: the
    accepted index finishes its neighbor surpluses)."""
    d = 4
    c = np.array([0.8, 0.5, 0.3, 0.2])
    exact = float(np.exp(0.5 * c @ c))
    cj = jnp.asarray(c)
    res = AdaptiveSparseGrid(d).integrate(
        lambda th: jnp.exp(cj @ th), tol=0.0, max_evals=300)
    assert not res["converged"]
    err = abs(res["mean"] - exact)
    assert err < 10.0 * max(res["error_est"], 1e-16)
    res2 = AdaptiveSparseGrid(d).integrate(
        lambda th: jnp.exp(cj @ th), tol=1e-9, max_evals=30000)
    # measured: converged at 6821 evals, |err| = 1.4e-10 <= est 9.9e-10
    assert res2["converged"] and abs(res2["mean"] - exact) < 5e-9
    assert abs(res2["mean"] - exact) < 10.0 * res2["error_est"]


def test_adaptive_vector_qoi_and_cost_aware():
    """Vector QoIs share one node set; the cost-aware indicator reaches
    the same closed forms."""
    c = jnp.asarray([0.6, 0.3])
    fn = lambda th: jnp.stack([jnp.exp(c @ th), th[0] ** 2])
    for ind in ("surplus", "surplus_per_eval"):
        res = AdaptiveSparseGrid(2).integrate(
            fn, tol=1e-11, max_evals=3000, indicator=ind)
        assert res["mean"].shape == (2,)
        assert abs(res["mean"][0] - np.exp(0.5 * 0.45)) < 1e-9
        assert abs(res["mean"][1] - 1.0) < 1e-10


def test_adaptive_clenshaw_curtis_nesting_economy():
    """With the nested CC rule the node cache makes refinements reuse
    every previously paid point: total evals stay below the plain
    Smolyak count at matched accuracy."""
    d = 3
    c = np.array([1.3, 0.7, 0.2])
    exact = float(np.prod(np.sin(c) / c))
    cj = jnp.asarray(c)
    fn = lambda x: jnp.cos(cj @ x)
    res = AdaptiveSparseGrid(d, rule="clenshaw-curtis").integrate(
        fn, tol=1e-10, max_evals=4000)
    assert abs(res["mean"] - exact) < 1e-8
    iso = SparseGrid(d, 6, rule="clenshaw-curtis")
    iso_err = abs(float(iso.integrate(fn)) - exact)
    assert abs(res["mean"] - exact) <= max(iso_err, 1e-10) * 1.5 \
        or res["n_evals"] < iso.n_nodes


def test_adaptive_validation():
    with pytest.raises(ValueError, match="rule"):
        AdaptiveSparseGrid(2, rule="mc")
    with pytest.raises(ValueError, match="d >= 1"):
        AdaptiveSparseGrid(0)
    with pytest.raises(ValueError, match="indicator"):
        AdaptiveSparseGrid(2).integrate(lambda th: th[0], indicator="x")
