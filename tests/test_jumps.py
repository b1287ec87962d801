"""Jump-diffusion MLMC (sim/jumps.py) — beyond-reference capability.

Validation anchors: the Merton (1976) Poisson-mixture closed form for
the European call, the martingale identity E[S_T] = s0 e^(mu T) under
the compensated drift, exact coarse-marginal consistency (the coarse
path of a coupled level has the SAME law as a plain path on the coarse
grid — summed Brownian increments and summed compound-Poisson log
jumps are both exact coarse-grid draws), the lam -> 0 degeneration to
Black-Scholes, and coupled-variance decay.
"""
import numpy as np
import pytest
import jax

from mlmc_tpu.sim.jumps import (JumpDiffusionSimulation,
                                coupled_jump_functionals, merton,
                                merton_call_price)
from mlmc_tpu.sim.sde import black_scholes_call, european_call

R, SIG, T = 0.05, 0.2, 1.0
LAM, JM, JV = 0.8, -0.1, 0.15


def _keys(seed, n):
    return jax.random.split(jax.random.key(seed), n)


def _telescoped(model, payoff, n_levels=4, n0=8, refine=2, N=1 << 14,
                seed=70):
    tot, var, lvars = 0.0, 0.0, []
    for lev in range(n_levels):
        nf = n0 * refine ** lev
        cfg = dict(model=model, total_time=T, n_fine=nf,
                   n_coarse=0 if lev == 0 else nf // refine)
        pf_f, pf_c = jax.jit(lambda k, cfg=cfg:
                             coupled_jump_functionals(cfg, k))(
            _keys(seed + lev, N))
        d = np.asarray(payoff(pf_f) - (payoff(pf_c)
                                       if pf_c is not None else 0.0))
        tot += d.mean()
        var += d.var() / N
        lvars.append(d.var())
    return tot, np.sqrt(var), lvars


def test_merton_call_vs_closed_form():
    """Telescoped MLMC price of the European call under Merton jumps
    lands on the Poisson-mixture closed form (CLT band + O(h) Euler
    bias allowance at the h=1/64 finest level)."""
    model = merton(R, SIG, LAM, JM, JV, 1.0)
    exact = merton_call_price(1.0, 1.0, R, SIG, LAM, JM, JV, T)
    disc = float(np.exp(-R * T))
    est, se, lvars = _telescoped(model, european_call(1.0, disc))
    assert abs(est - exact) < 6 * se + 2e-3, (est, exact, se)
    # coupled variance decays (Euler beta ~ 1 on the Lipschitz payoff)
    assert lvars[3] < 0.65 * lvars[2], lvars
    assert lvars[2] < 0.65 * lvars[1], lvars


def test_martingale_property():
    """Compensated drift makes e^(-mu T) S_T a martingale: the
    telescoped terminal mean must hit s0 e^(mu T)."""
    model = merton(R, SIG, LAM, JM, JV, 1.0)
    est, se, _ = _telescoped(model, lambda pf: pf.terminal, seed=71)
    assert abs(est - np.exp(R * T)) < 6 * se + 1.5e-3, (est, se)


def test_coarse_marginal_is_exact():
    """E[payoff(coarse of (n=32, m=2))] == E[payoff(fine of n=16)]:
    summed increments and summed log jumps are exact coarse-grid
    draws, so the telescope is consistent. 6-sigma band."""
    model = merton(R, SIG, LAM, JM, JV, 1.0)
    payoff = european_call(1.0)
    B = 1 << 15
    _, pf_c = jax.jit(lambda k: coupled_jump_functionals(
        dict(model=model, total_time=T, n_fine=32, n_coarse=16), k))(
        _keys(72, B))
    pf_f, _ = jax.jit(lambda k: coupled_jump_functionals(
        dict(model=model, total_time=T, n_fine=16, n_coarse=0), k))(
        _keys(73, B))
    a, b = np.asarray(payoff(pf_c)), np.asarray(payoff(pf_f))
    sig = np.sqrt(a.var() / B + b.var() / B)
    assert abs(a.mean() - b.mean()) < 6 * sig, (a.mean(), b.mean(), sig)


def test_zero_intensity_is_black_scholes():
    """lam = 0 degenerates to pure GBM: the telescoped call price must
    match Black-Scholes, and merton_call_price itself collapses to the
    k=0 term."""
    model = merton(R, SIG, 0.0, JM, JV, 1.0)
    bs = black_scholes_call(1.0, 1.0, R, SIG, T)
    assert abs(merton_call_price(1.0, 1.0, R, SIG, 0.0, JM, JV, T)
               - bs) < 1e-12
    disc = float(np.exp(-R * T))
    est, se, _ = _telescoped(model, european_call(1.0, disc), seed=74)
    assert abs(est - bs) < 6 * se + 2e-3, (est, bs, se)


def test_simulation_adapter_and_validation():
    """The Simulation-contract adapter runs a coupled level batch and
    rejects the continuous-path-only options."""
    sim = JumpDiffusionSimulation(dict(
        model=merton(R, SIG, LAM, JM, JV, 1.0), total_time=T,
        payoff=european_call(1.0, float(np.exp(-R * T)))))
    lev = sim.level_instance([T / 16], [T / 8])
    fine, coarse, failed = JumpDiffusionSimulation.calculate_batch(
        lev.config_dict, _keys(75, 512))
    assert fine.shape == (512, 1) and coarse.shape == (512, 1)
    assert not bool(np.any(np.asarray(failed)))
    assert np.all(np.isfinite(np.asarray(fine)))
    # host single-sample contract
    f0, c0 = JumpDiffusionSimulation.calculate(lev.config_dict, 7)
    assert np.isfinite(f0).all() and np.isfinite(c0).all()
    with pytest.raises(ValueError, match="antithetic"):
        JumpDiffusionSimulation(dict(antithetic=True))
    with pytest.raises(ValueError, match="extras"):
        JumpDiffusionSimulation(dict(path_extras=True))
    with pytest.raises(ValueError, match="Euler"):
        JumpDiffusionSimulation(dict(scheme="milstein"))
    with pytest.raises(ValueError, match="JumpDiffusion"):
        JumpDiffusionSimulation(dict(model="gbm"))
    with pytest.raises(ValueError, match="multiple"):
        coupled_jump_functionals(dict(model=merton(), total_time=T,
                                      n_fine=12, n_coarse=5),
                                 _keys(76, 4))
