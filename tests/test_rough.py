"""Rough volatility / rBergomi (sim/rough.py) — beyond-reference tier.

Validation anchors:

* the closed-form (2F1) Riemann-Liouville fBm covariance vs direct
  singularity-removing quadrature, the ``t^(2H)`` diagonal, and the
  ``min(s, t)`` degeneration at H = 1/2;
* the EMPIRICAL covariance of the Cholesky-constructed (Y, DW) vector
  vs the closed forms — pins the joint-matrix assembly/indexing;
* lognormal variance-process moments ``E[v_t] = xi0``,
  ``E[v_t^2] = xi0^2 exp(eta^2 t^(2H))``;
* eta -> 0 collapses to Black-Scholes EXACTLY (constant v makes the
  Euler log-S step exact — pure CLT band, no bias allowance);
* S-martingale identity at moderate vol-of-vol;
* restriction coupling: the coupled coarse marginal equals a
  standalone coarse-grid run in law;
* coupled-variance decay across levels.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.rough import (RBergomiSimulation, coupled_rbergomi_paths,
                                joint_cholesky, rbergomi, rl_fbm_cov,
                                rl_fbm_w_cov)
from mlmc_tpu.sim.sde import black_scholes_call

T = 1.0


def _keys(seed, n):
    return jax.random.split(jax.random.key(seed), n)


def _cov_quad(s, t, H, n_nodes=4000):
    """Direct quadrature oracle for Cov[Y_s, Y_t], s <= t: substitute
    z = (s-u)^(H+1/2) to remove the endpoint singularity."""
    a = H - 0.5
    zmax = s ** (a + 1.0)
    x, w = np.polynomial.legendre.leggauss(n_nodes)
    z = 0.5 * zmax * (x + 1.0)
    f = (t - s + z ** (1.0 / (a + 1.0))) ** a
    return 2.0 * H / (a + 1.0) * 0.5 * zmax * np.sum(w * f)


def test_rl_fbm_cov_closed_form():
    """2F1 covariance vs quadrature (1e-6), t^(2H) diagonal, and the
    Brownian min(s, t) limit at H = 1/2."""
    times = np.array([0.1, 0.35, 0.7, 1.0])
    for H in (0.07, 0.2, 0.4):
        C = rl_fbm_cov(times, H)
        assert np.allclose(np.diag(C), times ** (2 * H), rtol=1e-12)
        for i in range(len(times)):
            for j in range(i + 1, len(times)):
                q = _cov_quad(times[i], times[j], H)
                assert abs(C[i, j] - q) < 1e-6 * max(q, 1e-3), \
                    (H, times[i], times[j], C[i, j], q)
    C = rl_fbm_cov(times, 0.5)
    assert np.allclose(C, np.minimum(times[:, None], times[None, :]),
                       rtol=1e-10)


def test_joint_gaussian_construction():
    """Empirical second moments of the Cholesky-built (Y, DW) batch hit
    the closed forms: Var[Y_t] = t^(2H), Cov[Y_t, DW_j], Var[DW] = h —
    pins the joint-matrix assembly and the on-device matmul path."""
    H, n, B = 0.15, 8, 1 << 15
    L, times = joint_cholesky(n, T, H)
    z = np.asarray(jax.random.normal(jax.random.key(5), (B, 2 * n)))
    yw = z @ L.T
    y, dw = yw[:, :n], yw[:, n:]
    grid = T / n * np.arange(n + 1)
    # Var[Y]: relative CLT band ~ sqrt(2/B)
    assert np.allclose(y.var(axis=0), times ** (2 * H),
                       rtol=8 * np.sqrt(2.0 / B))
    assert np.allclose(dw.var(axis=0), T / n, rtol=8 * np.sqrt(2.0 / B))
    cyw = (y[:, :, None] * dw[:, None, :]).mean(axis=0)
    ref = rl_fbm_w_cov(times, grid, H)
    se = np.sqrt(times[:, None] ** (2 * H) * (T / n) / B)
    assert np.all(np.abs(cyw - ref) < 8 * se)
    # Y covariance spot checks
    cyy = y.T @ y / B
    ref_yy = rl_fbm_cov(times, H)
    se_yy = np.sqrt((ref_yy.diagonal()[:, None]
                     * ref_yy.diagonal()[None, :] + ref_yy ** 2) / B)
    assert np.all(np.abs(cyy - ref_yy) < 8 * se_yy)


def test_variance_process_moments():
    """E[v_t] = xi0 and E[v_t^2] = xi0^2 exp(eta^2 t^(2H)) — the
    lognormal moments of the exact-Gaussian variance process."""
    H, eta, xi0, n, B = 0.12, 0.6, 0.09, 16, 1 << 15
    L, times = joint_cholesky(n, T, H)
    z = np.asarray(jax.random.normal(jax.random.key(6), (B, 2 * n)))
    y = (z @ L.T)[:, :n]
    v = xi0 * np.exp(eta * y - 0.5 * eta ** 2 * times ** (2 * H))
    m2_ref = xi0 ** 2 * np.exp(eta ** 2 * times ** (2 * H))
    se1 = np.sqrt((m2_ref - xi0 ** 2) / B)
    assert np.all(np.abs(v.mean(axis=0) - xi0) < 6 * se1)
    m4 = xi0 ** 4 * np.exp(6 * eta ** 2 * times ** (2 * H))
    se2 = np.sqrt(np.maximum(m4 - m2_ref ** 2, 0.0) / B)
    assert np.all(np.abs((v ** 2).mean(axis=0) - m2_ref) < 6 * se2)


def _telescoped(model, payoff, levels, N, seed):
    tot, var = 0.0, 0.0
    for lev, (n_f, n_c) in enumerate(levels):
        s_f, s_c = jax.jit(lambda k, cfg=dict(
            model=model, total_time=T, n_fine=n_f, n_coarse=n_c):
            coupled_rbergomi_paths(cfg, k))(_keys(seed + lev, N))
        d = np.asarray(payoff(s_f)) - (np.asarray(payoff(s_c))
                                       if s_c is not None else 0.0)
        tot += d.mean()
        var += d.var() / N
    return tot, np.sqrt(var)


def test_zero_vol_of_vol_is_black_scholes():
    """eta = 0 makes v constant at xi0, and constant v makes the Euler
    log-S step EXACT — the telescoped call price must hit
    Black-Scholes(sigma = sqrt(xi0)) inside a pure CLT band."""
    model = rbergomi(xi0=0.04, eta=0.0, hurst=0.1, rho=-0.7)
    payoff = lambda s: jnp.maximum(s - 1.0, 0.0)
    est, se = _telescoped(model, payoff,
                          [(4, 0), (8, 4), (16, 8)], 1 << 15, 40)
    bs = black_scholes_call(1.0, 1.0, 0.0, 0.2, T)
    assert abs(est - bs) < 6 * se, (est, bs, se)


def test_martingale_identity():
    """E[S_T] = s0 (zero rate) at moderate vol-of-vol."""
    model = rbergomi(xi0=0.04, eta=0.5, hurst=0.3, rho=-0.5)
    est, se = _telescoped(model, lambda s: s,
                          [(4, 0), (8, 4), (16, 8), (32, 16)],
                          1 << 15, 41)
    assert abs(est - 1.0) < 6 * se + 2e-3, (est, se)


def test_restriction_coarse_marginal_is_exact():
    """The coupled coarse path IS the coarse-grid scheme: coupled
    coarse of (16, 8) vs a standalone n=8 run agree in law (6-sigma
    on the call payoff)."""
    model = rbergomi()
    payoff = lambda s: np.maximum(np.asarray(s) - 0.9, 0.0)
    B = 1 << 15
    _, s_c = jax.jit(lambda k: coupled_rbergomi_paths(
        dict(model=model, total_time=T, n_fine=16, n_coarse=8), k))(
        _keys(42, B))
    s_p, _ = jax.jit(lambda k: coupled_rbergomi_paths(
        dict(model=model, total_time=T, n_fine=8, n_coarse=0), k))(
        _keys(43, B))
    a, b = payoff(s_c), payoff(s_p)
    sig = np.sqrt(a.var() / B + b.var() / B)
    assert abs(a.mean() - b.mean()) < 6 * sig, (a.mean(), b.mean(), sig)


def test_coupled_variance_decay():
    """Var[payoff_f - payoff_c] decays with refinement under the
    restriction coupling at the rate the variance roughness sets:
    the v-freezing error is Hölder-H within a step, so beta ~ 2H —
    fast at H = 0.4, slow (but present: MLMC still beats plain MC)
    at the rough BFG H = 0.1 (measured ~0.85/level = 2^-0.23)."""
    payoff = lambda s: np.maximum(np.asarray(s) - 1.0, 0.0)
    B = 1 << 14

    def variances(model, seed):
        vs = []
        for n_f in (8, 16, 32, 64):
            s_f, s_c = jax.jit(
                lambda k, n_f=n_f: coupled_rbergomi_paths(
                    dict(model=model, total_time=T, n_fine=n_f,
                         n_coarse=n_f // 2), k))(_keys(seed, B))
            vs.append(float((payoff(s_f) - payoff(s_c)).var()))
        return vs

    vs_smooth = variances(rbergomi(xi0=0.04, eta=1.0, hurst=0.4,
                                   rho=-0.7), 44)
    assert vs_smooth[1] < 0.75 * vs_smooth[0], vs_smooth
    assert vs_smooth[2] < 0.75 * vs_smooth[1], vs_smooth
    assert vs_smooth[3] < 0.75 * vs_smooth[2], vs_smooth
    vs_rough = variances(rbergomi(), 45)          # BFG H = 0.1
    assert vs_rough[3] < 0.75 * vs_rough[0], vs_rough
    assert vs_rough[3] < vs_rough[2] < vs_rough[0], vs_rough


def test_qmc_adapter_exact_and_variance_reduced():
    """The Sobol' path (joint PCA + bridge-ordered dz) has the SAME
    exact grid law: its randomization-mean call price agrees with the
    PRNG estimate, and the per-randomization variance beats plain MC
    at equal points (measured; the payoff map is smooth in the
    Gaussian inputs)."""
    import jax.numpy as jnp
    from mlmc_tpu.ops import sobol
    from mlmc_tpu.sim.rough import rbergomi_qmc_level_fns

    model = rbergomi(xi0=0.04, eta=1.0, hurst=0.1, rho=-0.7)
    payoff = lambda s: jnp.maximum(s - 1.0, 0.0)
    (qfn,), (d,) = rbergomi_qmc_level_fns(model, T, [(16, 0)], payoff)
    n, R = 1 << 11, 8
    dv = sobol.direction_numbers(d)
    vals = []
    for r in range(R):
        seeds = sobol.scramble_seeds(jax.random.key(100 + r), d)
        u = sobol.sobol_uniforms(dv, 0, n, seeds)
        f, _ = qfn(u)
        vals.append(float(jnp.mean(f)))
    vals = np.asarray(vals)
    qmc_mean = vals.mean()
    qmc_se = vals.std(ddof=1) / np.sqrt(R)
    s_p, _ = jax.jit(lambda k: coupled_rbergomi_paths(
        dict(model=model, total_time=T, n_fine=16, n_coarse=0), k))(
        _keys(47, 1 << 15))
    mc = np.asarray(payoff(s_p))
    sig = np.sqrt(qmc_se ** 2 + mc.var() / mc.size)
    assert abs(qmc_mean - mc.mean()) < 6 * sig, (qmc_mean, mc.mean())
    # variance per point-set vs plain MC variance at the same n
    var_qmc = vals.var(ddof=1)
    var_mc = mc.var() / n
    assert var_qmc < var_mc / 3.0, (var_qmc, var_mc)


def test_simulation_adapter_and_validation():
    """Simulation-contract adapter: shapes, host path, validation."""
    model = rbergomi(xi0=0.04, eta=1.0, hurst=0.1, rho=-0.7)
    sim = RBergomiSimulation(dict(
        model=model, total_time=T,
        payoff=lambda s: jnp.maximum(s - 1.0, 0.0)))
    lev = sim.level_instance([T / 8], [T / 4])
    fine, coarse, failed = RBergomiSimulation.calculate_batch(
        lev.config_dict, _keys(45, 256))
    assert fine.shape == (256, 1) and coarse.shape == (256, 1)
    assert not bool(np.any(np.asarray(failed)))
    assert np.all(np.isfinite(np.asarray(fine)))
    f0, c0 = RBergomiSimulation.calculate(lev.config_dict, 3)
    assert np.isfinite(f0).all() and np.isfinite(c0).all()
    lev0 = sim.level_instance([T / 4], [0.0])
    _, c_l0, _ = RBergomiSimulation.calculate_batch(
        lev0.config_dict, _keys(46, 32))
    assert float(np.abs(np.asarray(c_l0)).max()) == 0.0
    with pytest.raises(ValueError, match="RBergomi"):
        RBergomiSimulation(dict(model="rough"))
    with pytest.raises(ValueError, match="integer"):
        sim.level_instance([T / 12], [T / 5])
    with pytest.raises(ValueError, match="hurst"):
        rbergomi(hurst=1.5)
    with pytest.raises(ValueError, match="rho"):
        rbergomi(rho=-2.0)
