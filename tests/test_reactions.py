"""Reaction-network MLMC (sim/reactions.py) — beyond-reference tier.

Validation anchors, each exact:

* the immigration-death process has a CLOSED-FORM law (Binomial
  survivors + Poisson immigrants) — the exact SSA must hit its
  mean/variance, and the full pure-death law is chi-squared-tested
  against the exact Binomial pmf;
* for LINEAR propensities the tau-leap mean and variance obey exact
  one-step recursions (the Poisson counts are conditionally exact), so
  the integrator is pinned against those recursions, not just a band;
* the Anderson-Higham coupling leaves the coarse marginal an EXACT
  tau-leap law (Poisson additivity) — coupled-coarse vs plain-run
  agreement on a nonlinear functional;
* coupled corrections decay as Var = O(tau);
* the telescoped MLMC estimate of a nonlinear (dimerization) network
  lands on the exact-SSA value (no closed form exists).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.reactions import (ReactionSimulation, coupled_tau_leap,
                                    dimerization, immigration_death,
                                    immigration_death_moments,
                                    mass_action, schlogl, ssa_exact,
                                    tau_leap)

BIRTH, DEATH, X0 = 8.0, 1.0, 20
T = 1.0


def _keys(seed, n):
    return jax.random.split(jax.random.key(seed), n)


def _tau_leap_moment_recursion(birth, death, x0, tau, n):
    """Exact tau-leap mean/var for the immigration-death network:
    x_{j+1} = x_j + Poi(birth tau) - Poi(death x_j tau), so
    m' = m + tau (birth - death m),
    v' = (1 - death tau)^2 v + tau (birth + death m)."""
    m, v = float(x0), 0.0
    for _ in range(n):
        v = (1.0 - death * tau) ** 2 * v + tau * (birth + death * m)
        m = m + tau * (birth - death * m)
    return m, v


def test_tau_leap_matches_exact_moment_recursion():
    """Sample mean/var of the tau-leap terminal count hit the exact
    linear-propensity recursions within CLT bands — pins the
    integrator itself, with the discretization bias REMOVED from the
    comparison."""
    net = immigration_death(BIRTH, DEATH, X0)
    n, B = 8, 1 << 15
    x = np.asarray(jax.jit(lambda k: tau_leap(net, T, n, k))(
        _keys(10, B)))[:, 0]
    m_ref, v_ref = _tau_leap_moment_recursion(BIRTH, DEATH, X0, T / n, n)
    se_m = np.sqrt(v_ref / B)
    assert abs(x.mean() - m_ref) < 6 * se_m, (x.mean(), m_ref)
    # var of the sample variance ~ (kurt-1) v^2 / B; Poisson-ish kurt
    se_v = np.sqrt(3.0) * v_ref / np.sqrt(B)
    assert abs(x.var() - v_ref) < 6 * se_v, (x.var(), v_ref)
    assert np.all(x == np.round(x)), "counts must stay integer-valued"


def test_ssa_exact_immigration_death_law():
    """Exact SSA terminal mean/variance match the closed-form
    immigration-death law (unbiased — no discretization allowance)."""
    net = immigration_death(BIRTH, DEATH, X0)
    B = 1 << 14
    x, overran = jax.jit(lambda k: ssa_exact(net, T, k, 220))(
        _keys(11, B))
    x, overran = np.asarray(x)[:, 0], np.asarray(overran)
    assert not overran.any(), f"{overran.sum()} lanes overran"
    m_ref, v_ref = immigration_death_moments(BIRTH, DEATH, X0, T)
    assert abs(x.mean() - m_ref) < 6 * np.sqrt(v_ref / B)
    assert abs(x.var() - v_ref) < 6 * np.sqrt(3.0) * v_ref / np.sqrt(B)


def test_ssa_pure_death_binomial_chi2():
    """Pure death from x0: X_T ~ Binomial(x0, e^{-dT}) exactly —
    chi-squared over the binomial pmf at 6-sigma-equivalent level."""
    from scipy import stats
    x0, d = 24, 1.2
    net = immigration_death(0.0, d, x0)
    B = 1 << 14
    x, overran = jax.jit(lambda k: ssa_exact(net, T, k, 40))(
        _keys(12, B))
    assert not np.asarray(overran).any()
    x = np.asarray(x)[:, 0].astype(int)
    p = np.exp(-d * T)
    ks = np.arange(x0 + 1)
    pmf = stats.binom.pmf(ks, x0, p)
    # merge tail bins below 5 expected counts
    keep = pmf * B >= 5.0
    obs = np.array([np.sum(x == k) for k in ks], float)
    obs_m = np.concatenate([obs[keep], [obs[~keep].sum()]])
    exp_m = np.concatenate([pmf[keep] * B, [pmf[~keep].sum() * B]])
    chi2 = float(np.sum((obs_m - exp_m) ** 2 / exp_m))
    crit = stats.chi2.ppf(1.0 - 1e-6, len(obs_m) - 1)
    assert chi2 < crit, (chi2, crit)


def test_coupled_coarse_marginal_is_exact():
    """E[f(coarse of (n=16, m=2))] == E[f(plain n=8 tau-leap)] for a
    nonlinear f — Poisson additivity makes the coupled coarse marginal
    an exact tau-leap law. 6-sigma band."""
    net = immigration_death(BIRTH, DEATH, X0)
    B = 1 << 15
    f = lambda x: x[:, 0] ** 2
    _, xc = jax.jit(lambda k: coupled_tau_leap(
        dict(network=net, total_time=T, n_fine=16, n_coarse=8), k))(
        _keys(13, B))
    xp = jax.jit(lambda k: tau_leap(net, T, 8, k))(_keys(14, B))
    a, b = np.asarray(f(xc)), np.asarray(f(xp))
    sig = np.sqrt(a.var() / B + b.var() / B)
    assert abs(a.mean() - b.mean()) < 6 * sig, (a.mean(), b.mean(), sig)


def test_coupled_variance_decay():
    """Var[X_f - X_c] decays ~ O(tau) under the Anderson-Higham
    coupling (vs O(1) for independent paths)."""
    net = dimerization()
    B = 1 << 13
    vars_, uncoupled = [], None
    for n_f in (8, 16, 32, 64):
        xf, xc = jax.jit(lambda k, n_f=n_f: coupled_tau_leap(
            dict(network=net, total_time=T, n_fine=n_f,
                 n_coarse=n_f // 2), k))(_keys(15, B))
        d = np.asarray(xf[:, 0] - xc[:, 0])
        vars_.append(d.var())
        if uncoupled is None:
            uncoupled = np.asarray(xf[:, 0]).var()
    assert vars_[1] < 0.65 * vars_[0], vars_
    assert vars_[2] < 0.65 * vars_[1], vars_
    assert vars_[3] < 0.65 * vars_[2], vars_
    assert vars_[0] < 0.5 * uncoupled, (vars_[0], uncoupled)


def test_mlmc_telescope_vs_exact_ssa():
    """Telescoped tau-leap MLMC on the dimerization network (quadratic
    propensity, no closed form) lands on the exact-SSA mean within the
    joint CLT band + the finest level's O(tau) bias allowance."""
    net = dimerization()
    B = 1 << 13
    tot, var = 0.0, 0.0
    for lev, n_f in enumerate((4, 8, 16, 32, 64)):
        xf, xc = jax.jit(lambda k, n_f=n_f, lev=lev: coupled_tau_leap(
            dict(network=net, total_time=T, n_fine=n_f,
                 n_coarse=0 if lev == 0 else n_f // 2), k))(
            _keys(20 + lev, B))
        d = np.asarray(xf[:, 0]) - (np.asarray(xc[:, 0])
                                    if xc is not None else 0.0)
        tot += d.mean()
        var += d.var() / B
    x_ref, overran = jax.jit(lambda k: ssa_exact(net, T, k, 512))(
        _keys(30, 1 << 13))
    assert not np.asarray(overran).any()
    ref = np.asarray(x_ref)[:, 0]
    sig = np.sqrt(var + ref.var() / ref.shape[0])
    # O(tau) weak bias at tau = 1/64 on a ~300-count species
    assert abs(tot - ref.mean()) < 6 * sig + 1.5, (tot, ref.mean(), sig)


def test_ssa_overrun_is_loud():
    """A too-small event budget flags lanes instead of silently
    truncating."""
    net = immigration_death(50.0, 1.0, 0)
    _, overran = jax.jit(lambda k: ssa_exact(net, T, k, 8))(_keys(31, 64))
    assert np.asarray(overran).mean() > 0.9


def test_simulation_adapter_and_validation():
    """Simulation-contract adapter: level batch shapes, per-species
    result format, integer-valued counts, host single-sample path and
    config validation."""
    sim = ReactionSimulation(dict(network=dimerization(),
                                  total_time=T))
    fmt = sim.result_format()
    assert [q.name for q in fmt] == ["A", "B"]
    lev = sim.level_instance([T / 16], [T / 8])
    fine, coarse, failed = ReactionSimulation.calculate_batch(
        lev.config_dict, _keys(32, 256))
    assert fine.shape == (256, 2) and coarse.shape == (256, 2)
    assert not bool(np.any(np.asarray(failed)))
    fine = np.asarray(fine)
    assert np.all(fine == np.round(fine))
    # 2A <-> B conserves A + 2B
    tot = fine[:, 0] + 2 * fine[:, 1]
    assert np.all(tot == tot[0])
    f0, c0 = ReactionSimulation.calculate(lev.config_dict, 5)
    assert np.isfinite(f0).all() and np.isfinite(c0).all()
    # qoi callable path
    sim_q = ReactionSimulation(dict(network=dimerization(),
                                    qoi=lambda x: x[:, 0]))
    assert [q.name for q in sim_q.result_format()] == ["qoi"]
    lev_q = sim_q.level_instance([T / 8], [0.0])
    fq, cq, _ = ReactionSimulation.calculate_batch(
        lev_q.config_dict, _keys(33, 64))
    assert fq.shape == (64, 1) and float(np.abs(np.asarray(cq)).max()) == 0.0
    with pytest.raises(ValueError, match="ReactionNetwork"):
        ReactionSimulation(dict(network="dimer"))
    with pytest.raises(ValueError, match="integer"):
        sim.level_instance([T / 12], [T / 5])
    with pytest.raises(ValueError, match="orders"):
        mass_action([1.0], [[3]])
    with pytest.raises(ValueError, match="one rate"):
        mass_action([1.0, 2.0], [[1]])


def test_schlogl_bistability():
    """The Schlögl network's terminal distribution at t=6 from the
    unstable region is bimodal: mass near both metastable modes
    (~85 and ~565). Tau-leaping is the right integrator here — the
    total event rate is ~1e4/unit-time, so exact SSA would need ~6e4
    sequential events per lane while tau-leap batches them into 1024
    Poisson steps."""
    net = schlogl()
    B = 1 << 12
    x = np.asarray(jax.jit(lambda k: tau_leap(net, 6.0, 1024, k))(
        _keys(34, B)))[:, 0]
    lo = np.mean(x < 250)
    hi = np.mean(x > 400)
    assert lo > 0.1 and hi > 0.1, (lo, hi)
