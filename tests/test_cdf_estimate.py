"""Multilevel CDF/quantile estimation (mlmc_tpu/cdf_estimate.py):
kernel exactness, telescoping against closed-form laws, kernel-order
bias separation, invalid-pair masking, quantile inversion with
delta-method errors, and the Simulation adapter against the exact
discrete OU law."""
import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

from mlmc_tpu.cdf_estimate import (smoothed_indicator, MultilevelCDF,
                                   simulation_pair_fn)


# ------------------------------------------------------------------ #
# kernels
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("order", [2, 4])
def test_kernel_endpoints_and_normalization(order):
    s = jnp.linspace(-2.0, 2.0, 2001)
    g = np.asarray(smoothed_indicator(s, order))
    assert g[0] == 0.0 and g[-1] == 1.0
    assert np.isclose(float(smoothed_indicator(jnp.zeros(()), order)), 0.5)
    # g' integrates to 1 (it's a density kernel)
    from mlmc_tpu.cdf_estimate import _kernel_pdf
    k = np.asarray(_kernel_pdf(s, order))
    u = np.asarray(s)
    assert np.isclose(np.trapezoid(k, u), 1.0, atol=1e-5)
    m2 = np.trapezoid(u * u * k, u)
    if order == 2:
        assert 0.1 < m2 < 0.2          # quartic kernel variance = 1/7
    else:
        assert abs(m2) < 1e-5          # vanishing second moment


def test_kernel_order_validation():
    with pytest.raises(ValueError, match="order"):
        smoothed_indicator(jnp.zeros(()), 3)


# ------------------------------------------------------------------ #
# synthetic hierarchy with an exact limit law
# ------------------------------------------------------------------ #
def _gauss_pair_fn(c=0.5, rate=1.0):
    """f_l = X + c 2^{-rate l} Y, (X, Y) std normal shared per key: the
    limit law is EXACTLY N(0, 1) and consecutive levels couple through
    the shared draw."""

    def fn(level, keys):
        def one(k):
            x, y = jax.random.normal(k, (2,))
            fine = x + c * 2.0 ** (-rate * level) * y
            coarse = x + c * 2.0 ** (-rate * (level - 1)) * y \
                if level > 0 else jnp.zeros(())
            return fine, coarse

        f, co = jax.vmap(one)(keys)
        return f, co, jnp.ones(keys.shape[0], dtype=bool)

    return fn


def test_multilevel_cdf_matches_normal_limit():
    grid = np.linspace(-4.0, 4.0, 161)
    ml = MultilevelCDF(_gauss_pair_fn(), n_levels=5, grid=grid,
                       bandwidth=0.05, seed=2, chunk_size=2048)
    for lv in range(5):
        ml.extend(lv, (1 << 15) >> lv)
    est = ml.estimates()
    # the finest level still has c 2^-4 Y residual: exact law at L-1 is
    # N(0, 1 + (c 2^-4)^2)
    sd = np.sqrt(1.0 + (0.5 * 2.0 ** -4) ** 2)
    exact = st.norm.cdf(grid / sd)
    err = np.abs(est["cdf"] - exact)
    tol = 6.0 * np.sqrt(np.maximum(est["cdf_var"], 1e-12)) + 2e-3
    assert np.all(err < tol), float(err.max())
    # pdf estimate tracks the density within its own reported error bars
    # (per-level kernel corrections are noisy when the coupling scale
    # exceeds delta — the variance accumulators must account for it)
    pdf_err = np.abs(est["pdf"] - st.norm.pdf(grid / sd) / sd)
    pdf_tol = 6.0 * np.sqrt(np.maximum(est["pdf_var"], 1e-12)) + 3e-3
    assert np.all(pdf_err < pdf_tol), float((pdf_err - pdf_tol).max())
    assert est["pdf_var"].max() < 0.05
    # projection keeps cdf monotone in [0, 1]
    assert np.all(np.diff(est["cdf"]) >= 0)
    assert est["cdf"].min() >= 0 and est["cdf"].max() <= 1


def test_quantiles_and_delta_method_errors():
    grid = np.linspace(-4.0, 4.0, 201)
    ml = MultilevelCDF(_gauss_pair_fn(c=0.1), n_levels=4, grid=grid,
                       bandwidth=0.05, seed=9, chunk_size=2048)
    ml.run(target_var=4e-6)
    ps = np.array([0.1, 0.5, 0.9])
    q, se = ml.quantiles(ps)
    sd = np.sqrt(1.0 + (0.1 * 2.0 ** -3) ** 2)
    exact = sd * st.norm.ppf(ps)
    assert np.all(np.abs(q - exact) < 6 * se + 5e-3), (q, exact, se)
    assert np.all(se > 0) and np.all(se < 0.05)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        ml.quantiles([0.0])


def test_kernel_order4_cuts_smoothing_bias():
    """At a deliberately huge bandwidth the order-2 kernel's O(delta^2)
    bias is visible while the order-4 kernel's O(delta^4) is not."""
    grid = np.array([1.0, 4.0])
    errs = {}
    for order in (2, 4):
        ml = MultilevelCDF(_gauss_pair_fn(c=0.0), n_levels=1, grid=grid,
                           bandwidth=1.0, kernel_order=order, seed=4,
                           chunk_size=4096)
        ml.extend(0, 1 << 17)
        errs[order] = abs(ml.estimates()["cdf_raw"][0] - st.norm.cdf(1.0))
    assert errs[2] > 8e-3                  # analytic ~ 1.7e-2
    assert errs[4] < 5e-3                  # analytic ~ 6e-4


def test_invalid_pairs_are_masked():
    def fn(level, keys):
        def one(k):
            x, u = jax.random.normal(k, (2,))
            bad = u > 1.0                   # ~16% invalid
            return jnp.where(bad, jnp.nan, x), jnp.zeros(()), ~bad

        f, co, ok = jax.vmap(one)(keys)
        return f, co, ok

    grid = np.linspace(-3.0, 3.0, 61)
    ml = MultilevelCDF(fn, n_levels=1, grid=grid, bandwidth=0.1, seed=0,
                       chunk_size=1024)
    ml.extend(0, 1 << 14)
    est = ml.estimates()
    n_total = ml._states[0].n
    frac = est["n_samples"][0] / n_total
    assert 0.78 < frac < 0.88               # P(u <= 1) ~ 0.841
    # conditional law X | u <= 1 is still N(0,1) (independent draws)
    err = np.abs(est["cdf"] - st.norm.cdf(grid))
    assert np.all(err < 6 * np.sqrt(np.maximum(est["cdf_var"], 1e-12))
                  + 2e-3)


def test_validation_errors():
    fn = _gauss_pair_fn()
    with pytest.raises(ValueError, match="n_levels"):
        MultilevelCDF(fn, 0, [0.0, 1.0], 0.1)
    with pytest.raises(ValueError, match="increasing"):
        MultilevelCDF(fn, 2, [1.0, 0.0], 0.1)
    with pytest.raises(ValueError, match="bandwidth"):
        MultilevelCDF(fn, 2, [0.0, 1.0], -0.1)
    with pytest.raises(ValueError, match="n_levels values"):
        MultilevelCDF(fn, 2, [0.0, 1.0], [0.1])
    with pytest.raises(ValueError, match="order"):
        MultilevelCDF(fn, 2, [0.0, 1.0], 0.1, kernel_order=3)
    ml = MultilevelCDF(fn, 1, np.linspace(-0.1, 0.1, 5), 0.05, seed=1)
    ml.extend(0, 2048)
    with pytest.raises(ValueError, match="bracket"):
        ml.quantiles([0.01])


# ------------------------------------------------------------------ #
# Simulation adapter: exact discrete OU law
# ------------------------------------------------------------------ #
def test_simulation_adapter_ou_terminal_law():
    """SDESimulation OU via the generic adapter: the telescoped CDF must
    match the EXACT law of the finest-level Euler chain (an AR(1), so
    its terminal is Gaussian with computable mean/var) — no bias
    tolerance beyond smoothing + statistics."""
    from mlmc_tpu.sim.sde import SDESimulation, ornstein_uhlenbeck

    kappa, theta, sigma, s0, T = 1.2, 0.3, 0.5, 1.0, 1.0
    sim = SDESimulation(dict(model=ornstein_uhlenbeck(kappa, theta, sigma,
                                                      s0),
                             total_time=T))
    params = [[0.25], [0.125], [0.0625]]
    pair_fn, L = simulation_pair_fn(sim, params)
    assert L == 3
    grid = np.linspace(-1.2, 2.2, 121)
    ml = MultilevelCDF(pair_fn, L, grid, bandwidth=0.04, seed=6,
                       chunk_size=2048, cost_fn=lambda lv: 2.0 ** lv)
    ml.run(target_var=1e-5, n_init=4096)
    est = ml.estimates()
    n = 16
    dt = T / n
    a = 1.0 - kappa * dt
    mean = theta + (s0 - theta) * a ** n
    var = sigma ** 2 * dt * (1.0 - a ** (2 * n)) / (1.0 - a * a)
    exact = st.norm.cdf((grid - mean) / np.sqrt(var))
    err = np.abs(est["cdf"] - exact)
    tol = 6.0 * np.sqrt(np.maximum(est["cdf_var"], 1e-12)) + 3e-3
    assert np.all(err < tol), float(err.max())


def test_simulation_adapter_requires_batch_path():
    class NoBatch:
        @staticmethod
        def has_batch_path():
            return False

    class Dummy:
        pass

    dummy = Dummy()
    dummy.__class__ = NoBatch
    with pytest.raises(ValueError, match="batch path"):
        simulation_pair_fn(dummy, [[0.5]])


# ------------------------------------------------------------------ #
# mesh sharding
# ------------------------------------------------------------------ #
def test_mesh_sharded_matches_single_device():
    """mesh= shards each chunk across the 8-device virtual mesh with the
    SAME position -> key mapping: accumulators must match the
    single-device estimator to reduction-order rounding."""
    from mlmc_tpu.parallel.mesh import SampleMesh

    grid = np.linspace(-3.0, 3.0, 41)
    fn = _gauss_pair_fn()
    m1 = MultilevelCDF(fn, 3, grid, 0.1, seed=13, chunk_size=1 << 10)
    m8 = MultilevelCDF(fn, 3, grid, 0.1, seed=13, chunk_size=1 << 10,
                       mesh=SampleMesh())
    for lv in range(3):
        m1.extend(lv, 2048)
        m8.extend(lv, 2048)
    e1, e8 = m1.estimates(), m8.estimates()
    assert np.array_equal(e1["n_samples"], e8["n_samples"])
    np.testing.assert_allclose(e1["cdf"], e8["cdf"], rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(e1["pdf"], e8["pdf"], rtol=1e-11,
                               atol=1e-13)


def test_mesh_chunk_divisibility_validated():
    from mlmc_tpu.parallel.mesh import SampleMesh

    with pytest.raises(ValueError, match="divide"):
        MultilevelCDF(_gauss_pair_fn(), 2, [0.0, 1.0], 0.1,
                      chunk_size=10, mesh=SampleMesh())
