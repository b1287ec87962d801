"""SPDE MLMC (sim/spde.py) — beyond-reference tier.

Validation anchors:

* the LINEAR semi-implicit scheme is exactly Gaussian: per-mode AR(1)
  variances and the energy ``E||u(T)||^2`` are pinned against the
  closed-form recursion (``discrete_heat_l2_moment``) — integrator
  correctness with the discretization bias REMOVED;
* the telescoped estimate targets the finest level's discrete law
  EXACTLY (pure CLT band), and the discrete laws converge to the
  continuum OU-mode sum (``heat_spde_l2_moment``) as levels refine;
* box aggregation keeps the coupled coarse marginal an exact
  coarse-grid law — its energy hits the coarse closed form;
* coupled-variance decay;
* the sigma -> 0 Allen-Cahn limit is deterministic and
  resolution-consistent, reaching the bistable +1 attractor.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.spde import (SPDESimulation, allen_cahn,
                               coupled_spde_paths,
                               discrete_heat_l2_moment,
                               heat_spde_l2_moment, stochastic_heat)

NU, SIG, T = 1.0, 1.0, 0.5


def _keys(seed, n):
    return jax.random.split(jax.random.key(seed), n)


def _run(model, Nf, nf, Nc, nc, B, seed):
    cfg = dict(model=model, total_time=T, n_cells_fine=Nf,
               n_steps_fine=nf, n_cells_coarse=Nc, n_steps_coarse=nc)
    return jax.jit(lambda k: coupled_spde_paths(cfg, k))(_keys(seed, B))


def _l2sq(u):
    u = np.asarray(u)
    return u.shape[1] ** -1 * (u ** 2).sum(axis=1)


def test_discrete_law_is_exact():
    """Per-mode variances AND the energy of the linear scheme hit the
    exact AR(1) closed forms (CLT bands only — no discretization
    allowance)."""
    N, n, B = 16, 8, 1 << 14
    u, _ = _run(stochastic_heat(NU, SIG), N, n, 0, 0, B, 50)
    u = np.asarray(u)
    # rebuild the orthonormal DST-II modes
    i = np.arange(N)
    k = np.arange(1, N + 1)
    S = np.sin((i[None, :] + 0.5) * k[:, None] * np.pi / N)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    a = u @ S.T
    dx, dt = 1.0 / N, T / n
    lam = 4.0 * np.sin(k * np.pi / (2 * N)) ** 2 / dx ** 2
    r2 = 1.0 / (1.0 + dt * NU * lam) ** 2
    var_ref = SIG ** 2 * dt / dx * r2 * (1.0 - r2 ** n) / (1.0 - r2)
    # Gaussian: Var(a^2) = 2 var^2 -> 6-sigma per-mode band
    se = np.sqrt(2.0 / B) * var_ref
    assert np.all(np.abs(a.var(axis=0) - var_ref) < 6 * se)
    assert abs(np.mean(a, axis=0).max()) < 6 * np.sqrt(var_ref.max() / B)
    e_ref = discrete_heat_l2_moment(NU, SIG, T, N, n)
    e = _l2sq(u)
    assert abs(e.mean() - e_ref) < 6 * e.std() / np.sqrt(B), \
        (e.mean(), e_ref)


def test_telescope_hits_finest_discrete_law_and_converges():
    """The telescoped energy equals the finest level's closed-form
    discrete value (pure CLT band), and the discrete laws converge to
    the continuum OU-mode sum."""
    model = stochastic_heat(NU, SIG)
    levels = [(8, 4, 0, 0), (16, 16, 8, 4), (32, 64, 16, 16)]
    B = 1 << 13
    tot, var = 0.0, 0.0
    for lev, (Nf, nf, Nc, nc) in enumerate(levels):
        uf, uc = _run(model, Nf, nf, Nc, nc, B, 51 + lev)
        d = _l2sq(uf) - (_l2sq(uc) if uc is not None else 0.0)
        tot += d.mean()
        var += d.var() / B
    ref = discrete_heat_l2_moment(NU, SIG, T, 32, 64)
    assert abs(tot - ref) < 6 * np.sqrt(var), (tot, ref, np.sqrt(var))
    cont = heat_spde_l2_moment(NU, SIG, T)
    errs = [abs(discrete_heat_l2_moment(NU, SIG, T, N, n) - cont)
            for (N, n, _, _) in levels]
    assert errs[1] < 0.6 * errs[0] and errs[2] < 0.6 * errs[1], errs
    assert abs(tot - cont) < 6 * np.sqrt(var) + 1.2 * errs[2]


def test_coarse_marginal_is_exact():
    """The coupled coarse field's energy hits the COARSE closed form —
    box aggregation is an exact coarse-grid white-noise draw."""
    B = 1 << 14
    _, uc = _run(stochastic_heat(NU, SIG), 32, 32, 16, 8, B, 54)
    e = _l2sq(uc)
    ref = discrete_heat_l2_moment(NU, SIG, T, 16, 8)
    assert abs(e.mean() - ref) < 6 * e.std() / np.sqrt(B), \
        (e.mean(), ref)


def test_coupled_variance_decay():
    """Var[E_f - E_c] decays under box-aggregated shared noise."""
    model = stochastic_heat(NU, SIG)
    B = 1 << 13
    vs = []
    for Nf, nf in ((16, 16), (32, 64), (64, 256)):
        uf, uc = _run(model, Nf, nf, Nf // 2, nf // 4, B, 55)
        vs.append(float((_l2sq(uf) - _l2sq(uc)).var()))
    assert vs[1] < 0.5 * vs[0], vs
    assert vs[2] < 0.5 * vs[1], vs
    v_unc = float(_l2sq(uf).var())
    assert vs[0] < v_unc, (vs[0], v_unc)


def test_allen_cahn_deterministic_limit():
    """sigma = 0 Allen-Cahn from a sin bump: deterministic (zero
    sample variance), resolution-consistent, and reaching the +1
    bistable attractor in the interior."""
    model = allen_cahn(nu=0.01, sigma=0.0)
    cfg = dict(model=model, total_time=8.0, n_cells_fine=32,
               n_steps_fine=256, n_cells_coarse=0, n_steps_coarse=0)
    u32, _ = jax.jit(lambda k: coupled_spde_paths(cfg, k))(_keys(56, 4))
    cfg2 = dict(cfg, n_cells_fine=64, n_steps_fine=1024)
    u64, _ = jax.jit(lambda k: coupled_spde_paths(cfg2, k))(_keys(57, 2))
    u32, u64 = np.asarray(u32), np.asarray(u64)
    assert np.abs(u32[0] - u32[-1]).max() < 1e-12
    # cell-average comparison on the shared coarse cells
    agg = u64[0].reshape(32, 2).mean(axis=1)
    assert np.abs(agg - u32[0]).max() < 0.02
    assert u32[0, 8:24].min() > 0.9


def test_simulation_adapter_and_validation():
    """Simulation-contract adapter: [dx, dt] level parameters, both
    QoIs, host path, validation."""
    sim = SPDESimulation(dict(model=stochastic_heat(NU, SIG),
                              total_time=T))
    lev = sim.level_instance([1 / 16, T / 16], [1 / 8, T / 4])
    fine, coarse, failed = SPDESimulation.calculate_batch(
        lev.config_dict, _keys(58, 256))
    assert fine.shape == (256, 1) and coarse.shape == (256, 1)
    assert not bool(np.any(np.asarray(failed)))
    assert np.all(np.isfinite(np.asarray(fine)))
    f0, c0 = SPDESimulation.calculate(lev.config_dict, 9)
    assert np.isfinite(f0).all() and np.isfinite(c0).all()
    lev0 = sim.level_instance([1 / 8, T / 4], [0.0, 0.0])
    _, c_l0, _ = SPDESimulation.calculate_batch(
        lev0.config_dict, _keys(59, 32))
    assert float(np.abs(np.asarray(c_l0)).max()) == 0.0
    # point QoI
    sim_p = SPDESimulation(dict(model=stochastic_heat(NU, SIG),
                                total_time=T, qoi="point"))
    lev_p = sim_p.level_instance([1 / 16, T / 16], [0.0, 0.0])
    fp, _, _ = SPDESimulation.calculate_batch(lev_p.config_dict,
                                              _keys(60, 4096))
    fp = np.asarray(fp)[:, 0]
    assert abs(fp.mean()) < 6 * fp.std() / 64  # zero-IC symmetry
    # callable QoI
    sim_c = SPDESimulation(dict(qoi=lambda u, dx: dx * jnp.sum(u,
                                                               axis=1)))
    assert sim_c.result_format()[0].name == "qoi"
    with pytest.raises(ValueError, match="SPDE1D"):
        SPDESimulation(dict(model="heat"))
    with pytest.raises(ValueError, match="qoi"):
        SPDESimulation(dict(qoi="energy"))
    with pytest.raises(ValueError, match="integer"):
        coupled_spde_paths(dict(model=stochastic_heat(), total_time=T,
                                n_cells_fine=12, n_steps_fine=8,
                                n_cells_coarse=5, n_steps_coarse=4),
                           _keys(61, 4))
    with pytest.raises(ValueError, match="both"):
        coupled_spde_paths(dict(model=stochastic_heat(), total_time=T,
                                n_cells_fine=8, n_steps_fine=8,
                                n_cells_coarse=4, n_steps_coarse=0),
                           _keys(62, 4))
