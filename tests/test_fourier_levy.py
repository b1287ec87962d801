"""COS Fourier pricing (tool/fourier_pricing.py) + variance-gamma MLMC
(sim/levy.py) — beyond-reference tiers.

The COS engine is pinned at (near-)machine precision against THREE
independent implementations — Black-Scholes closed form, the Merton
Poisson-mixture sum, and the Gil-Pelaez Heston integral — plus
put-call parity, the martingale identity ``cf(-1j) = e^{rT}`` for
every model, and closed-vs-numerical cumulants. It then anchors the
VG Monte Carlo: exact increments (the terminal law has NO
discretization error), coarse paths as restrictions of the same path
(bitwise-identical terminals), and the monitoring-frequency telescope.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.jumps import merton_call_price
from mlmc_tpu.sim.levy import (VarianceGammaSimulation,
                               coupled_vg_functionals, variance_gamma,
                               vg_call_price)
from mlmc_tpu.sim.sde import (asian_call, black_scholes_call,
                              european_call, heston_call_price)
from mlmc_tpu.tool.fourier_pricing import (cf_gbm, cf_heston, cf_merton,
                                           cf_vg, cos_price,
                                           cumulants_from_cf, vg_omega)

R, T = 0.05, 1.0
VG = dict(sigma=0.12, theta=-0.14, nu=0.2)


def _keys(seed, n):
    return jax.random.split(jax.random.key(seed), n)


# ------------------------------------------------------------------- #
# COS engine
# ------------------------------------------------------------------- #
def test_cos_gbm_machine_precision():
    for K in (0.7, 1.0, 1.4):
        c = cos_price(cf_gbm(R, 0.2, T), 1.0, K, R, T)
        assert abs(c - black_scholes_call(1.0, K, R, 0.2, T)) < 1e-12
    # puts + parity
    p = cos_price(cf_gbm(R, 0.2, T), 1.0, 1.0, R, T, kind="put")
    c = cos_price(cf_gbm(R, 0.2, T), 1.0, 1.0, R, T)
    assert abs((c - p) - (1.0 - np.exp(-R * T))) < 1e-12


def test_cos_merton_vs_poisson_mixture():
    cf = cf_merton(R, 0.2, 0.8, -0.1, 0.15, T)
    c = cos_price(cf, 1.0, 1.0, R, T, c1=cf.cumulants[0],
                  c2=cf.cumulants[1], c4=cf.cumulants[2])
    assert abs(c - merton_call_price(1.0, 1.0, R, 0.2, 0.8, -0.1,
                                     0.15, T)) < 1e-12


def test_cos_heston_vs_gil_pelaez():
    """Two fully independent Heston pricing paths (COS series vs
    Gil-Pelaez quadrature of the probabilities) agree to 1e-8."""
    args = dict(rate=R, kappa=2.0, theta=0.04, xi=0.3, rho=-0.7,
                v0=0.04, T=T)
    c = cos_price(cf_heston(**args), 1.0, 1.1, R, T)
    ref = heston_call_price(1.0, 1.1, R, 2.0, 0.04, 0.3, -0.7, 0.04, T)
    assert abs(c - ref) < 1e-8, (c, ref)


def test_martingale_identity_every_cf():
    """cf(-1j) = E[S_T/S_0] = e^{rT} for every model."""
    u = np.array([-1j])
    for cf in (cf_gbm(R, 0.2, T),
               cf_merton(R, 0.2, 0.8, -0.1, 0.15, T),
               cf_vg(R, T=T, **VG),
               cf_heston(R, 2.0, 0.04, 0.3, -0.7, 0.04, T)):
        assert abs(cf(u)[0] - np.exp(R * T)) < 1e-10


def test_cumulants_and_vg_limits():
    cf = cf_vg(R, T=T, **VG)
    c1n, c2n = cumulants_from_cf(cf)
    assert abs(c1n - cf.cumulants[0]) < 1e-6
    assert abs(c2n - cf.cumulants[1]) < 1e-6 * max(cf.cumulants[1], 1)
    # nu -> 0: VG -> GBM
    cf0 = cf_vg(R, 0.2, 1e-9, 1e-8, T)
    assert abs(cos_price(cf0, 1.0, 1.0, R, T)
               - black_scholes_call(1.0, 1.0, R, 0.2, T)) < 1e-6
    with pytest.raises(ValueError, match="martingale"):
        vg_omega(1.0, 2.0, 2.0)
    with pytest.raises(ValueError, match="kind"):
        cos_price(cf, 1.0, 1.0, R, T, kind="straddle")


# ------------------------------------------------------------------- #
# variance gamma MC
# ------------------------------------------------------------------- #
def test_vg_terminal_vs_cos():
    """Single-level MC call (exact increments — no bias at ANY grid)
    lands on the COS price inside a pure CLT band."""
    model = variance_gamma(R, **VG)
    B = 1 << 16
    pf, _ = jax.jit(lambda k: coupled_vg_functionals(
        dict(model=model, total_time=T, n_fine=4, n_coarse=0), k))(
        _keys(80, B))
    disc = np.exp(-R * T)
    v = disc * np.maximum(np.asarray(pf.terminal) - 1.0, 0.0)
    ref = vg_call_price(1.0, 1.0, R, T=T, **VG)
    se = v.std() / np.sqrt(B)
    assert abs(v.mean() - ref) < 6 * se, (v.mean(), ref, se)
    # martingale identity
    s = np.asarray(pf.terminal)
    assert abs(s.mean() - np.exp(R * T)) < 6 * s.std() / np.sqrt(B)


def test_vg_restriction_coupling():
    """The coarse path IS the fine path at shared nodes: terminals
    bitwise identical, coarse extrema dominated by fine extrema, and
    the coupled coarse Asian marginal matches a standalone coarse
    run."""
    model = variance_gamma(R, **VG)
    B = 1 << 14
    pf_f, pf_c = jax.jit(lambda k: coupled_vg_functionals(
        dict(model=model, total_time=T, n_fine=16, n_coarse=4), k))(
        _keys(81, B))
    assert np.array_equal(np.asarray(pf_f.terminal),
                          np.asarray(pf_c.terminal))
    assert np.all(np.asarray(pf_c.maximum) <= np.asarray(pf_f.maximum))
    assert np.all(np.asarray(pf_c.minimum) >= np.asarray(pf_f.minimum))
    pf_p, _ = jax.jit(lambda k: coupled_vg_functionals(
        dict(model=model, total_time=T, n_fine=4, n_coarse=0), k))(
        _keys(82, B))
    a = np.asarray(pf_c.average)
    b = np.asarray(pf_p.average)
    sig = np.sqrt(a.var() / B + b.var() / B)
    assert abs(a.mean() - b.mean()) < 6 * sig


def test_vg_monitoring_telescope():
    """Asian-payoff telescope over monitoring levels reproduces the
    finest standalone estimate (the couplings share one exact path),
    and the correction variance decays with refinement."""
    model = variance_gamma(R, **VG)
    B = 1 << 14
    payoff = asian_call(0.95, float(np.exp(-R * T)))
    tot, var, lvars = 0.0, 0.0, []
    for lev, n_f in enumerate((4, 8, 16, 32)):
        pf_f, pf_c = jax.jit(lambda k, n_f=n_f, lev=lev:
                             coupled_vg_functionals(
            dict(model=model, total_time=T, n_fine=n_f,
                 n_coarse=0 if lev == 0 else n_f // 2), k))(
            _keys(83 + lev, B))
        d = np.asarray(payoff(pf_f)) - (np.asarray(payoff(pf_c))
                                        if pf_c is not None else 0.0)
        tot += d.mean()
        var += d.var() / B
        if lev:
            lvars.append(d.var())
    pf32, _ = jax.jit(lambda k: coupled_vg_functionals(
        dict(model=model, total_time=T, n_fine=32, n_coarse=0), k))(
        _keys(90, B))
    ref = np.asarray(payoff(pf32))
    sig = np.sqrt(var + ref.var() / B)
    assert abs(tot - ref.mean()) < 6 * sig, (tot, ref.mean(), sig)
    assert lvars[1] < 0.6 * lvars[0], lvars
    assert lvars[2] < 0.6 * lvars[1], lvars


def test_vg_simulation_adapter_and_validation():
    model = variance_gamma(R, **VG)
    sim = VarianceGammaSimulation(dict(
        model=model, total_time=T,
        payoff=european_call(1.0, float(np.exp(-R * T)))))
    lev = sim.level_instance([T / 8], [T / 4])
    fine, coarse, failed = VarianceGammaSimulation.calculate_batch(
        lev.config_dict, _keys(91, 256))
    assert fine.shape == (256, 1) and coarse.shape == (256, 1)
    assert not bool(np.any(np.asarray(failed)))
    f0, c0 = VarianceGammaSimulation.calculate(lev.config_dict, 11)
    assert np.isfinite(f0).all() and np.isfinite(c0).all()
    with pytest.raises(ValueError, match="VarianceGamma"):
        VarianceGammaSimulation(dict(model="vg"))
    with pytest.raises(ValueError, match="antithetic"):
        VarianceGammaSimulation(dict(antithetic=True))
    with pytest.raises(ValueError, match="exact"):
        VarianceGammaSimulation(dict(scheme="milstein"))
    with pytest.raises(ValueError, match="martingale"):
        variance_gamma(R, sigma=1.0, theta=2.0, nu=2.0)