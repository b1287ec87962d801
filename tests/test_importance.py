"""Girsanov importance sampling for the SDE family (``drift_shift``).

The discrete identity under test is EXACT at any grid: each shifted
increment is ``N(theta dt, dt)``, so the Radon-Nikodym factor of the
plain increment law w.r.t. the shifted one is
``prod_i exp(-theta dw_i - theta^2 dt/2) = exp(-theta W_T -
theta^2 T/2)`` — precisely :attr:`PathFunctionals.log_weight`. Hence
``E[payoff * w]`` under the shift equals the plain discrete-scheme
expectation for ANY payoff and ANY scheme whose driving noise is the
increment (Euler and Milstein alike), and the weight has mean exactly
one. Layers: weight-mean-1, theta=0 bitwise regression, same-grid
equality vs the plain estimator, the deep-OTM Black-Scholes anchor
with measured variance reduction, telescope consistency on a coupled
level, functionals-QoI storage, and the loud rejections.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.sde import (
    SDESimulation, black_scholes_call, coupled_path_functionals,
    digital_call_smoothed, european_call, gbm, gbm_call_shift,
    lookback_call_bb,
)


def _run(cfg, n_samples, seed=0):
    keys = jax.random.split(jax.random.key(seed), n_samples)
    return jax.jit(lambda k: coupled_path_functionals(cfg, keys=k))(keys)


def test_theta_zero_is_bitwise_plain():
    """drift_shift=0.0 takes the unshifted code path exactly (no
    log_weight, identical terminals)."""
    base = dict(model=gbm(), scheme="euler", total_time=1.0,
                n_fine=16, n_coarse=4)
    pf0, _, pc0 = _run(base, 256)
    pf1, _, pc1 = _run(dict(base, drift_shift=0.0), 256)
    assert pf1.log_weight is None and pc1.log_weight is None
    np.testing.assert_array_equal(np.asarray(pf0.terminal),
                                  np.asarray(pf1.terminal))
    np.testing.assert_array_equal(np.asarray(pc0.average),
                                  np.asarray(pc1.average))


def test_weight_mean_is_one():
    """E[exp(log_weight)] = 1 (the LR integrates to one) within 6 CLT
    sigmas, and fine/coarse share the identical weight array."""
    cfg = dict(model=gbm(), scheme="euler", total_time=1.0,
               n_fine=32, n_coarse=8, drift_shift=1.3)
    pf, _, pc = _run(cfg, 1 << 15)
    w = np.asarray(jnp.exp(pf.log_weight))
    np.testing.assert_array_equal(w, np.asarray(jnp.exp(pc.log_weight)))
    se = w.std() / np.sqrt(w.size)
    assert abs(w.mean() - 1.0) < 6.0 * se, (w.mean(), se)


def test_same_grid_equality_with_plain():
    """At the SAME discretization the weighted estimate and the plain
    estimate target the identical discrete expectation — agreement
    within 6 combined sigmas on a mildly-OTM call (where the plain
    estimator still has hits), Milstein to exercise the (dW)^2 term
    under the shifted increment."""
    model = gbm(mu=0.05, sigma=0.2, s0=1.0)
    strike = 1.3
    pay = european_call(strike, discount=np.exp(-0.05))
    base = dict(model=model, scheme="milstein", total_time=1.0,
                n_fine=32, n_coarse=0)
    pf, _, _ = _run(base, 1 << 15, seed=1)
    plain = np.asarray(pay(pf))
    theta = gbm_call_shift(0.05, 0.2, 1.0, strike, 1.0)
    pfs, _, _ = _run(dict(base, drift_shift=theta), 1 << 15, seed=2)
    weighted = np.asarray(pay(pfs) * jnp.exp(pfs.log_weight))
    se = np.hypot(plain.std() / np.sqrt(plain.size),
                  weighted.std() / np.sqrt(weighted.size))
    assert abs(plain.mean() - weighted.mean()) < 6.0 * se


def test_deep_otm_anchor_and_variance_cut():
    """Deep-OTM call (K = 1.8 s0): the IS estimate lands on
    Black-Scholes within 6 se + a 2% weak-bias allowance, and the
    measured estimator variance beats plain MC by > 20x at the same
    path count."""
    r, sigma, s0, strike, T = 0.05, 0.2, 1.0, 1.8, 1.0
    price = black_scholes_call(s0, strike, r, sigma, T)
    pay = european_call(strike, discount=np.exp(-r * T))
    theta = gbm_call_shift(r, sigma, s0, strike, T)
    base = dict(model=gbm(mu=r, sigma=sigma, s0=s0), scheme="milstein",
                total_time=T, n_fine=256, n_coarse=0)
    pfs, _, _ = _run(dict(base, drift_shift=theta), 1 << 16, seed=3)
    weighted = np.asarray(pay(pfs) * jnp.exp(pfs.log_weight))
    se = weighted.std() / np.sqrt(weighted.size)
    assert abs(weighted.mean() - price) < 6.0 * se + 0.02 * price, \
        (weighted.mean(), price, se)
    pf, _, _ = _run(base, 1 << 16, seed=4)
    plain = np.asarray(pay(pf))
    assert plain.var() > 20.0 * weighted.var(), \
        (plain.var(), weighted.var())


def test_coupled_telescope_consistency():
    """On a coupled level the weighted fine-coarse correction estimates
    the plain discrete correction (same grids) — 6 combined sigmas;
    the shared weight keeps the coarse marginal exact."""
    model = gbm(mu=0.05, sigma=0.2, s0=1.0)
    pay = european_call(1.3)
    base = dict(model=model, scheme="euler", total_time=1.0,
                n_fine=32, n_coarse=8)
    pf, _, pc = _run(base, 1 << 15, seed=5)
    d_plain = np.asarray(pay(pf) - pay(pc))
    theta = gbm_call_shift(0.05, 0.2, 1.0, 1.3, 1.0)
    pfs, _, pcs = _run(dict(base, drift_shift=theta), 1 << 15, seed=6)
    w = jnp.exp(pfs.log_weight)
    d_is = np.asarray((pay(pfs) - pay(pcs)) * w)
    se = np.hypot(d_plain.std() / np.sqrt(d_plain.size),
                  d_is.std() / np.sqrt(d_is.size))
    assert abs(d_plain.mean() - d_is.mean()) < 6.0 * se


def test_extras_lookback_consistent_under_shift():
    """path_extras compose with the shift (the BGK shift and the
    barrier bridge are increments-measurable): the weighted BGK
    lookback agrees with the plain one within 6 combined sigmas."""
    base = dict(model=gbm(), scheme="euler", total_time=1.0,
                n_fine=64, n_coarse=0, path_extras=True)
    pay = lookback_call_bb()
    pf, _, _ = _run(base, 1 << 14, seed=7)
    plain = np.asarray(pay(pf))
    pfs, _, _ = _run(dict(base, drift_shift=0.7), 1 << 14, seed=8)
    assert pfs.digital_mu is None      # smoothing disabled under shift
    weighted = np.asarray(pay(pfs) * jnp.exp(pfs.log_weight))
    se = np.hypot(plain.std() / np.sqrt(plain.size),
                  weighted.std() / np.sqrt(weighted.size))
    assert abs(plain.mean() - weighted.mean()) < 6.0 * se


def test_digital_smoothed_rejected_under_shift():
    cfg = dict(model=gbm(), scheme="euler", total_time=1.0,
               n_fine=8, n_coarse=0, path_extras=True, drift_shift=0.5)
    pf, _, _ = _run(cfg, 8)
    with pytest.raises(ValueError, match="drift_shift"):
        digital_call_smoothed(1.0)(pf)


def test_simulation_payoff_weighted_and_functionals_store_weight():
    """SDESimulation plumbing: payoff QoIs come out pre-weighted; the
    functionals QoI stores log_weight as a fifth quantity whose exp has
    mean ~ 1."""
    theta = gbm_call_shift(0.05, 0.2, 1.0, 1.5, 1.0)
    sim = SDESimulation(dict(model=gbm(), total_time=1.0,
                             payoff=european_call(1.5),
                             drift_shift=theta))
    lvl = sim.level_instance([1.0 / 16], [0])
    keys = jax.random.split(jax.random.key(9), 4096)
    fine, _, _ = SDESimulation.calculate_batch(lvl.config_dict, keys)
    assert fine.shape == (4096, 1) and np.isfinite(fine).all()

    sim_f = SDESimulation(dict(model=gbm(), total_time=1.0,
                               qoi="functionals", drift_shift=theta))
    specs = sim_f.result_format()
    assert [s.name for s in specs][-1] == "log_weight"
    lvl = sim_f.level_instance([1.0 / 16], [0])
    fine, _, _ = SDESimulation.calculate_batch(lvl.config_dict, keys)
    assert fine.shape == (4096, 5)
    w = np.exp(np.asarray(fine[:, 4]))
    assert abs(w.mean() - 1.0) < 6.0 * w.std() / np.sqrt(w.size)


def test_mlqmc_composes_with_drift_shift():
    """IS rides the QMC adapter unchanged (the weight applies inside
    _assemble and the LR is exact for ANY increment source): the
    MLQMC-driven deep-OTM call lands on Black-Scholes within the
    randomization se + a weak-bias allowance."""
    from mlmc_tpu.qmc import MLQMC
    from mlmc_tpu.sim.sde import sde_qmc_level_fns

    r, sigma, s0, K, T = 0.05, 0.2, 1.0, 1.8, 1.0
    theta = gbm_call_shift(r, sigma, s0, K, T)
    price = black_scholes_call(s0, K, r, sigma, T)
    sim = SDESimulation(dict(model=gbm(mu=r, sigma=sigma, s0=s0),
                             scheme="milstein", total_time=T,
                             payoff=european_call(K, np.exp(-r * T)),
                             drift_shift=theta))
    fns, dims = sde_qmc_level_fns(sim, [[T / 16], [T / 64], [T / 256]])
    ml = MLQMC(fns, dims, n_randomizations=8, seed=11,
               chunk_size=1 << 10)
    res = ml.run(target_var=(0.02 * price) ** 2, n_init=1 << 10)
    err = abs(res["mean"] - price)
    assert err < 6.0 * np.sqrt(res["var"]) + 0.03 * price, \
        (res["mean"], price, res["var"])


def test_rejections():
    from mlmc_tpu.sim.sde import SDESystemSimulation, heston
    from mlmc_tpu.sim.levy import VarianceGammaSimulation

    sys_sim = SDESystemSimulation(dict(model=heston(), total_time=1.0,
                                       drift_shift=0.5))
    lvl = sys_sim.level_instance([1.0 / 8], [0])
    with pytest.raises(ValueError, match="scalar-SDE"):
        SDESystemSimulation.calculate_batch(
            lvl.config_dict, jax.random.split(jax.random.key(0), 4))
    with pytest.raises(ValueError, match="drift_shift"):
        VarianceGammaSimulation(dict(drift_shift=0.5))
    with pytest.raises(ValueError, match="finite"):
        coupled_path_functionals(
            dict(model=gbm(), total_time=1.0, n_fine=4, n_coarse=0,
                 drift_shift=float("nan")),
            keys=jax.random.split(jax.random.key(0), 2))
