"""Unbiased randomized MLMC (mlmc_tpu/unbiased.py): unbiasedness against
closed forms, the single-term and coupled-sum variance formulas (analytic
and empirical-over-runs), exact realized counts through the masked chunk
programs, stream continuation, and the SDE adapter's zero-discretization-
bias pricing property."""
import numpy as np
import pytest

from mlmc_tpu.unbiased import (GeometricLevels, UnbiasedMLMC,
                               synth_unbiased_level_fn,
                               sde_unbiased_level_fn)


# ------------------------------------------------------------------ #
# distribution
# ------------------------------------------------------------------ #
def test_geometric_levels_validation():
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        GeometricLevels(1.0)
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        GeometricLevels(0.0)
    with pytest.raises(ValueError, match="beta.*gamma"):
        GeometricLevels.from_rates(beta=1.0, gamma=1.0)
    g = GeometricLevels.from_rates(beta=2.0, gamma=1.0)
    assert np.isclose(g.r, 2.0 ** -1.5)
    lv = np.arange(50)
    assert np.isclose(np.sum(g.p(lv)), 1.0, atol=1e-7)
    assert np.allclose(g.tail(lv), np.cumsum(g.p(lv)[::-1])[::-1]
                       + g.tail(49) - g.p(49), atol=1e-12)


def _analytic_moments(mean, c, rate, noise, levels):
    """Exact per-level (mu_l, E[Delta_l^2]) of synth_unbiased_level_fn."""
    mus, m2s = [], []
    for lv in levels:
        if lv == 0:
            # mean + noise Z + c (1 + A)
            mus.append(mean + c)
            m2s.append((mean + c) ** 2 + noise ** 2 + c ** 2)
        else:
            d = c * (2.0 ** (-rate * lv) - 2.0 ** (-rate * (lv - 1)))
            mus.append(d)
            m2s.append(2.0 * d * d)
    return np.array(mus), np.array(m2s)


def _analytic_var(mode, dist, mean, c, rate, noise, n_terms=80):
    lv = np.arange(n_terms)
    mu, m2 = _analytic_moments(mean, c, rate, noise, lv)
    if mode == "single":
        return float(np.sum(m2 / dist.p(lv))) - mean ** 2
    tails = dist.tail(lv)
    v = m2 - mu * mu
    var = float(np.sum(v / tails))
    t_joint = np.minimum(tails[:, None], tails[None, :])
    cross = t_joint / (tails[:, None] * tails[None, :]) - 1.0
    return var + float(mu @ cross @ mu)


# ------------------------------------------------------------------ #
# synthetic hierarchy: unbiasedness + variance formulas
# ------------------------------------------------------------------ #
@pytest.mark.parametrize("mode", ["single", "coupled"])
def test_synth_unbiased_estimate(mode):
    mean, c, rate, noise = 2.5, 0.5, 1.0, 0.7
    fn, exact = synth_unbiased_level_fn(mean, c, rate, noise)
    dist = GeometricLevels.from_rates(beta=2 * rate, gamma=0.5)
    mc = UnbiasedMLMC(fn, dist, estimator=mode, seed=3, chunk_size=1024)
    mc.sample(1 << 15)
    est = mc.estimates()
    sigma = np.sqrt(est["var"])
    assert abs(est["mean"] - exact) < 6 * sigma
    # reported per-draw variance matches the analytic value (plug-in
    # moment noise allows a modest band)
    var_ref = _analytic_var(mode, dist, mean, c, rate, noise)
    assert 0.7 * var_ref < est["var_per_draw"] < 1.4 * var_ref
    # the coupled-sum estimator evaluates level 0 on EVERY draw
    if mode == "coupled":
        assert est["n_samples"][0] == mc.n_draws
    else:
        assert est["n_samples"].sum() == mc.n_draws


@pytest.mark.parametrize("mode", ["single", "coupled"])
def test_reported_variance_matches_empirical(mode):
    """Empirical variance of independent runs ~ the reported Var(Z)/B."""
    mean, c, rate, noise = 1.0, 0.5, 1.0, 0.5
    fn, _ = synth_unbiased_level_fn(mean, c, rate, noise)
    dist = GeometricLevels(0.35)
    means, reported = [], []
    for s in range(24):
        mc = UnbiasedMLMC(fn, dist, estimator=mode, seed=100 + s,
                          chunk_size=512)
        mc.sample(2048)
        est = mc.estimates()
        means.append(est["mean"])
        reported.append(est["var"])
    emp = np.var(means, ddof=1)
    rep = np.mean(reported)
    assert 0.45 < emp / rep < 2.2, (emp, rep)


def test_exact_realized_counts_through_masked_chunks():
    """Counts are never rounded to chunk multiples: with Delta == 1 the
    per-level sums must equal the realized counts exactly."""
    def fn(level, keys):
        import jax.numpy as jnp
        return jnp.ones(keys.shape[0])

    mc = UnbiasedMLMC(fn, GeometricLevels(0.4), estimator="single",
                      seed=7, chunk_size=256)
    mc.sample(1000)
    mc.sample(777)          # continuation exercises non-aligned starts
    assert mc.n_draws == 1777
    total = 0
    for lv, st in mc._states.items():
        assert st.sum == st.n, (lv, st.sum, st.n)
        total += st.n
    assert total == 1777


def test_coupled_counts_are_nested():
    fn, _ = synth_unbiased_level_fn()
    mc = UnbiasedMLMC(fn, GeometricLevels(0.5), estimator="coupled", seed=1)
    mc.sample(4096)
    est = mc.estimates()
    ns = est["n_samples"]
    assert ns[0] == 4096
    assert np.all(np.diff(ns) <= 0)          # survivor counts decrease


def test_adaptive_run_meets_target():
    fn, exact = synth_unbiased_level_fn(mean=1.0, c=0.4, rate=1.2,
                                        noise=0.6)
    mc = UnbiasedMLMC(fn, GeometricLevels(0.3), estimator="single", seed=11,
                      chunk_size=1024)
    out = mc.run(target_var=2e-5)
    assert out["target_met"]
    assert out["var"] <= 2e-5
    assert abs(out["mean"] - exact) < 6 * np.sqrt(out["var"])
    assert out["cost_per_draw"] > 0


def test_max_level_guard_raises():
    fn, _ = synth_unbiased_level_fn()
    mc = UnbiasedMLMC(fn, GeometricLevels(0.9), estimator="single",
                      seed=0, max_level=1)
    with pytest.raises(RuntimeError, match="max_level"):
        mc.sample(4096)


def test_validation_errors():
    fn, _ = synth_unbiased_level_fn()
    with pytest.raises(ValueError, match="single.*coupled"):
        UnbiasedMLMC(fn, GeometricLevels(0.5), estimator="both")
    mc = UnbiasedMLMC(fn, GeometricLevels(0.5))
    with pytest.raises(ValueError, match="no draws"):
        mc.estimates()


# ------------------------------------------------------------------ #
# SDE adapter: zero discretization bias at any budget
# ------------------------------------------------------------------ #
def test_sde_unbiased_gbm_price():
    """Milstein GBM European call: the unbiased estimate targets the
    EXACT Black-Scholes price — statistical error only, no weak bias to
    balance, at beta ~ 2 > gamma ~ 1 (square-root regime)."""
    from mlmc_tpu.sim.sde import (SDESimulation, gbm, european_call,
                                  black_scholes_call)

    rate_r, sigma, strike, T = 0.05, 0.2, 1.1, 1.0
    sim = SDESimulation(dict(
        model=gbm(mu=rate_r, sigma=sigma), scheme="milstein",
        payoff=european_call(strike, discount=np.exp(-rate_r * T)),
        total_time=T))
    fn = sde_unbiased_level_fn(sim, n0=4, refine=2)
    mc = UnbiasedMLMC(fn, GeometricLevels.from_rates(beta=2.0, gamma=1.0),
                      estimator="single", seed=5, chunk_size=1024,
                      cost_fn=lambda lv: 2.0 ** lv)
    mc.sample(1 << 14)
    est = mc.estimates()
    exact = black_scholes_call(1.0, strike, rate_r, sigma, T)
    assert abs(est["mean"] - exact) < 6 * np.sqrt(est["var"])
    # the estimator actually explored a hierarchy, not one level
    assert len(est["levels"]) >= 4


def test_sde_adapter_validation():
    from mlmc_tpu.sim.sde import SDESimulation

    sim = SDESimulation(dict(qoi="functionals"))
    with pytest.raises(ValueError, match="payoff"):
        sde_unbiased_level_fn(sim)
    sim2 = SDESimulation({})
    with pytest.raises(ValueError, match="refine"):
        sde_unbiased_level_fn(sim2, n0=4, refine=1)


# ------------------------------------------------------------------ #
# mesh sharding + extended-precision integration
# ------------------------------------------------------------------ #
def test_mesh_sharded_matches_single_device():
    """mesh= shards each chunk across the 8-device virtual mesh with the
    SAME position -> key mapping: per-level sums must match the
    single-device estimator to reduction-order rounding."""
    from mlmc_tpu.parallel.mesh import SampleMesh

    fn, _ = synth_unbiased_level_fn(mean=1.0)
    m1 = UnbiasedMLMC(fn, GeometricLevels(0.4), estimator="single",
                      seed=21, chunk_size=1 << 10)
    m8 = UnbiasedMLMC(fn, GeometricLevels(0.4), estimator="single",
                      seed=21, chunk_size=1 << 10, mesh=SampleMesh())
    m1.sample(3000)
    m8.sample(3000)
    e1, e8 = m1.estimates(), m8.estimates()
    assert np.array_equal(e1["n_samples"], e8["n_samples"])
    np.testing.assert_allclose(e1["mean"], e8["mean"], rtol=1e-12)
    np.testing.assert_allclose(e1["var_per_draw"], e8["var_per_draw"],
                               rtol=1e-10)


def test_mesh_chunk_divisibility_validated():
    from mlmc_tpu.parallel.mesh import SampleMesh

    fn, _ = synth_unbiased_level_fn()
    with pytest.raises(ValueError, match="divide"):
        UnbiasedMLMC(fn, GeometricLevels(0.5), chunk_size=10,
                     mesh=SampleMesh())


def test_df64_protects_long_horizon_f32_integration():
    """The f32 noise floor that motivates precision='df64': integrate
    one 32768-step Milstein GBM path batch from the SAME normals in
    (a) f64, (b) plain f32, (c) df64-over-f32 — the double-float state
    must track the f64 terminal 10x+ closer than plain f32."""
    import jax
    import jax.numpy as jnp
    from mlmc_tpu.sim.sde import coupled_path_functionals, gbm

    n = 1 << 15
    z64 = jax.random.normal(jax.random.key(3), (32, n), jnp.float64)
    base = dict(model=gbm(0.05, 0.2, 1.0), scheme="milstein",
                total_time=1.0, n_fine=n, n_coarse=0)
    t64 = np.asarray(coupled_path_functionals(base, z=z64)[0].terminal)
    z32 = z64.astype(jnp.float32)
    t32 = np.asarray(coupled_path_functionals(base, z=z32)[0].terminal)
    tdf = np.asarray(coupled_path_functionals(
        dict(base, precision="df64"), z=z32)[0].terminal)
    err32 = np.abs(t32 - t64).max()
    errdf = np.abs(tdf - t64).max()
    assert errdf < err32 / 10.0, (err32, errdf)
    assert errdf < 5e-5
    with pytest.raises(ValueError, match="precision"):
        coupled_path_functionals(dict(base, precision="quad"), z=z32)
