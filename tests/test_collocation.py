"""Sparse-grid collocation tests: Novak-Ritter polynomial exactness,
spectral convergence on analytic integrands with Gaussian/uniform
closed forms, Clenshaw-Curtis nestedness economics, the one-pass
variance, and the multilevel telescope."""
import numpy as np
import jax.numpy as jnp
import pytest

from mlmc_tpu.collocation import SparseGrid, multilevel_collocation


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
