"""End-to-end statistical validation of the estimator stack
(the working MLMCTest-fixture equivalent)."""
import numpy as np
import pytest
import scipy.integrate as integrate

from mlmc_tpu import Memory, SynthSimulation, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.random.distributions import Norm
from mlmc_tpu.tool import validation


@pytest.fixture(scope="module")
def mlmc_run():
    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=17, min_bucket=64),
                      sim, [[0.1], [0.02], [0.004]])
    sampler.set_initial_n_samples([4000, 1000, 200])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    vq = quantity["length"][1]["10"][0]
    mfn = Legendre(6, distr.ppf([1e-6, 1 - 1e-6]))
    est = est_mod.Estimate(vq, storage, mfn)
    return distr, sampler, storage, est, mfn


def _exact_moments(mfn, distr, h):
    """Quadrature moments of sample_fn(x, h) under N(0,1)."""
    def fn(x, i):
        q = x + h * np.sqrt(1e-4 + abs(x))
        return np.asarray(mfn.eval_all_np(np.array([q])))[0, i] * distr.pdf(x)

    return np.array([
        integrate.quad(lambda x, i=i: fn(x, i), -6, 6)[0]
        for i in range(mfn.size)
    ])


def test_convergence_rates_exact():
    """alpha/beta/gamma recover exactly from exactly-log-linear data, and
    Richardson extrapolation removes the discretization bias exactly for
    geometric steps."""
    h = 0.5 ** np.arange(5)
    a, c = 2.0, 0.3
    means = np.empty(5)
    means[0] = 1.0 - c * h[0] ** a                   # coarse anchor
    means[1:] = c * (h[:-1] ** a - h[1:] ** a)       # telescoped diffs
    variances = 0.7 * h ** 3.0
    n_ops = 2.0 * h ** -2.0

    rates = est_mod.estimate_convergence_rates(means, variances, h, n_ops)
    assert abs(rates["alpha"] - a) < 1e-10, rates
    assert abs(rates["beta"] - 3.0) < 1e-10, rates
    assert abs(rates["gamma"] - 2.0) < 1e-10, rates

    extrap, bias = est_mod.richardson_extrapolation(means, h, rates["alpha"])
    assert abs(bias - c * h[-1] ** a) < 1e-12
    assert abs(extrap - 1.0) < 1e-12          # true h->0 value
    assert abs(means.sum() - 1.0) > 1e-5      # ...which the raw sum misses


def test_convergence_rates_mlmc(mlmc_run):
    """Rates estimated from a real MLMC run are finite and positive: the
    synthetic QoI y + h*sqrt(1e-4+|y|) has first-order weak error and
    second-order diff variance in h."""
    import mlmc_tpu.quantity.quantity_estimate as qe

    distr, sampler, storage, est, mfn = mlmc_run
    root = make_root_quantity(storage, q_specs=SynthSimulation(
        dict(distr=distr, complexity=2)).result_format())
    vq = root["length"][1]["10"][0, 0]
    m = qe.estimate_mean(vq)
    rates = est_mod.estimate_convergence_rates(
        m.l_means, m.l_vars, storage.get_level_parameters(),
        storage.get_n_ops())
    assert np.isfinite(rates["alpha"]) and rates["alpha"] > 0.3, rates
    assert np.isfinite(rates["beta"]) and rates["beta"] > 0.8, rates


def test_moment_means_validation(mlmc_run):
    distr, sampler, storage, est, mfn = mlmc_run
    # telescoped estimate converges to the FINEST level's exact moments
    exact = _exact_moments(mfn, distr, 0.004)
    validation.validate_moment_means(est, mfn, exact)


def test_variance_regression_validation(mlmc_run):
    distr, sampler, storage, est, mfn = mlmc_run
    rms = validation.validate_variance_regression(
        est, sampler._n_scheduled_samples)
    assert rms >= 0


def test_variance_of_variance_validation(mlmc_run):
    distr, sampler, storage, est, mfn = mlmc_run
    est._n_created_samples = sampler._n_scheduled_samples
    validation.validate_variance_of_variance(est, n_samples=[200, 100, 50])


def test_total_variance_validation():
    """Repeated estimates scatter like the claimed variance."""
    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    mfn = Legendre(4, distr.ppf([1e-6, 1 - 1e-6]))
    reps = []
    claimed = None
    for rep in range(12):
        storage = Memory()
        sampler = Sampler(storage, DeviceBatchPool(seed=100 + rep,
                                                   min_bucket=64),
                          sim, [[0.1], [0.02]])
        sampler.set_initial_n_samples([400, 100])
        sampler.schedule_samples()
        sampler.ask_sampling_pool_for_samples()
        q = make_root_quantity(storage, q_specs=sim.result_format())
        vq = q["length"][1]["10"][0]
        means, variances = est_mod.Estimate(vq, storage, mfn).estimate_moments(mfn)
        reps.append(np.asarray(means))
        claimed = np.asarray(variances)
    validation.validate_total_variance(np.stack(reps), claimed)


def test_bootstrap_fast_matches_general(mlmc_run):
    """Device-vmapped bootstrap agrees statistically with the general
    (eager subsample) bootstrap path."""
    distr, sampler, storage, est, mfn = mlmc_run
    sv = [1000, 300, 80]

    est.est_bootstrap(n_subsamples=60, sample_vector=sv)
    gen = dict(mean=est.mean_bs_mean.copy(), var_mean=est.var_bs_mean.copy(),
               l_vars=est.mean_bs_l_vars.copy())

    est.est_bootstrap_fast(n_subsamples=60, sample_vector=sv, seed=3)
    fast = dict(mean=est.mean_bs_mean, var_mean=est.var_bs_mean,
                l_vars=est.mean_bs_l_vars)

    # both estimate the same quantities; agree within bootstrap scatter
    tol = 6 * np.sqrt(gen["var_mean"] / 60 + fast["var_mean"] / 60) + 1e-8
    assert np.all(np.abs(gen["mean"] - fast["mean"]) < tol)
    # bootstrap variance magnitudes in the same ballpark (factor 3)
    nz = gen["var_mean"][1:] > 0
    ratio = fast["var_mean"][1:][nz] / gen["var_mean"][1:][nz]
    assert np.all(ratio < 5) and np.all(ratio > 0.2), ratio


def test_bootstrap_structured_quantity():
    """est_bootstrap over a STRUCTURED quantity: the level-variance scaling
    must broadcast over the extra QoI axes (regression: it crashed with a
    [L, R, M] x [L, 1] broadcast error)."""
    from mlmc_tpu import Memory, SynthSimulation, DeviceBatchPool, Sampler, Legendre
    from mlmc_tpu import estimator as est_mod
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu.random.distributions import Norm

    sim = SynthSimulation(dict(distr=Norm()))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=1), sim, [[0.1], [0.01]])
    sampler.set_initial_n_samples([300, 100])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, q_specs=sim.result_format())
    ts = root["length"][1]                   # 2 locations x (2, 1)
    est = est_mod.Estimate(ts, storage, Legendre(5, (-10.0, 10.0)))
    est.est_bootstrap(n_subsamples=5, sample_vector=[100, 40])
    M = ts.qtype.size()
    assert est.mean_bs_mean.shape == (5, M)
    assert est.var_bs_l_means.shape == (2, 5, M)
    assert est._bs_level_mean_variance.shape == (2, 5, M)
    assert np.all(np.isfinite(est.mean_bs_mean))


def test_bootstrap_fast_structured_quantity():
    """Device bootstrap for a structured quantity: all components in the
    same vmapped program, [L, R, M] statistics matching est_bootstrap's
    shapes, component 0 identical to the scalar fast path (same keys)."""
    from mlmc_tpu import Memory, SynthSimulation, DeviceBatchPool, Sampler, Legendre
    from mlmc_tpu import estimator as est_mod
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu.random.distributions import Norm

    sim = SynthSimulation(dict(distr=Norm()))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=1), sim, [[0.1], [0.01]])
    sampler.set_initial_n_samples([300, 100])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, q_specs=sim.result_format())
    ts = root["length"][1]
    mfn = Legendre(5, (-10.0, 10.0))

    scalar_est = est_mod.Estimate(ts["10"][0], storage, mfn)
    scalar_est.est_bootstrap_fast(n_subsamples=30, sample_vector=[200, 80],
                                  seed=7)
    scalar_mean = scalar_est.mean_bs_mean.copy()

    est = est_mod.Estimate(ts, storage, mfn)
    est.est_bootstrap_fast(n_subsamples=30, sample_vector=[200, 80], seed=7)
    M = ts.qtype.size()
    assert est.mean_bs_mean.shape == (5, M)
    assert est.mean_bs_l_vars.shape == (2, 5, M)
    assert est._bs_level_mean_variance.shape == (2, 5, M)
    assert np.allclose(est.mean_bs_mean[:, 0], scalar_mean, atol=1e-12)
    assert np.all(np.isfinite(est.var_bs_l_vars))


def test_fused_adaptive_achieves_target_variance():
    """The FULL adaptive pipeline keeps its promise: independent runs to
    target_var scatter with an empirical variance consistent with (at
    most) the target — the end-to-end MLMC contract, not just one
    estimator's claim."""
    import jax
    from mlmc_tpu.fused_driver import FusedMLMC
    from mlmc_tpu.sim.synth_simulation import SynthSimulation

    distr = Norm()
    sim = SynthSimulation(dict(distr="norm", complexity=2))
    steps = [0.5, 0.1, 0.02]
    fns = [SynthSimulation.scalar_batch_fn(
        h, 0.0 if i == 0 else steps[i - 1], distr)
        for i, h in enumerate(steps)]
    mfn = Legendre(4, (-4.0, 4.0))
    target = 2e-4

    reps = []
    for rep in range(16):
        driver = FusedMLMC(fns, mfn, jax.random.key(500 + rep),
                           chunk_size=512)
        est = driver.run(target_var=target, initial_n=(256, 32),
                         add_coeff=0.3)
        assert float(np.max(est["var"][1:])) <= target
        reps.append(np.asarray(est["mean"]))
    reps = np.stack(reps)                      # [16, R]
    emp_var = reps.var(axis=0, ddof=1)[1:]
    # chi2(15): the empirical variance of a within-target estimator stays
    # under ~2.4x the target at the 99% level; 4x flags a broken pipeline
    assert np.all(emp_var < 4.0 * target), emp_var / target


def test_bootstrap_with_replacement_matches(mlmc_run):
    """replace=True (classical Efron bootstrap, O(N) randint+gather — no
    per-replicate sort) estimates the same uncertainty as the
    without-replacement path: means within the combined scatter, spread
    magnitudes in the same ballpark (with-replacement spread is the
    larger of the two at n_sub ~ N: subsampling without replacement at
    full size is nearly deterministic)."""
    distr, sampler, storage, est, mfn = mlmc_run
    sv = [1000, 300, 80]

    est.est_bootstrap_fast(n_subsamples=60, sample_vector=sv, seed=3)
    wo = dict(mean=est.mean_bs_mean.copy(),
              var_mean=est.var_bs_mean.copy())

    for scheme in (True, "poisson"):
        est.est_bootstrap_fast(n_subsamples=60, sample_vector=sv, seed=3,
                               replace=scheme)
        wr = dict(mean=est.mean_bs_mean, var_mean=est.var_bs_mean)

        tol = (6 * np.sqrt(wo["var_mean"] / 60 + wr["var_mean"] / 60)
               + 1e-8)
        assert np.all(np.abs(wo["mean"] - wr["mean"]) < tol), scheme
        nz = wo["var_mean"][1:] > 0
        ratio = wr["var_mean"][1:][nz] / wo["var_mean"][1:][nz]
        assert np.all(ratio < 10) and np.all(ratio > 0.1), (scheme,
                                                            ratio)


def test_bootstrap_poisson_structured_quantity():
    """The one-dispatch packed Poisson bootstrap on a STRUCTURED
    quantity: [B, L, R, M]-shaped statistics with the same attribute
    shapes as the per-level paths, finite, and the across-replicate
    mean-spread scaling ~1/n_l across levels (more samples => tighter
    replicate means)."""
    from mlmc_tpu import (Memory, SynthSimulation, DeviceBatchPool,
                          Sampler, Legendre)
    from mlmc_tpu import estimator as est_mod
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu.random.distributions import Norm

    sim = SynthSimulation(dict(distr=Norm()))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=1), sim,
                      [[0.1], [0.01]])
    sampler.set_initial_n_samples([1600, 100])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, q_specs=sim.result_format())
    ts = root["length"][1]
    mfn = Legendre(5, (-10.0, 10.0))
    est = est_mod.Estimate(ts, storage, mfn)
    assert est._quantity.traceable()
    est.est_bootstrap_fast(n_subsamples=40, seed=7, replace="poisson")
    M = ts.qtype.size()
    assert est.mean_bs_mean.shape == (5, M)
    assert est.mean_bs_l_vars.shape == (2, 5, M)
    assert np.all(np.isfinite(est.mean_bs_mean))
    assert np.all(np.isfinite(est.var_bs_l_means))
    pois = est.var_bs_l_means.copy()
    # the classical (gather) bootstrap estimates the same level-mean
    # sampling variance: per-level nontrivial-moment averages agree
    # within a replicate-noise band
    est.est_bootstrap_fast(n_subsamples=40, seed=7, replace=True)
    classical = est.var_bs_l_means
    for lvl in range(2):
        r = pois[lvl, 1:].mean() / classical[lvl, 1:].mean()
        assert 0.3 < r < 3.0, (lvl, r)


def test_bootstrap_replace_scheme_validated(mlmc_run):
    distr, sampler, storage, est, mfn = mlmc_run
    with pytest.raises(ValueError, match="replace"):
        est.est_bootstrap_fast(n_subsamples=4, replace="gauss")


def test_bootstrap_poisson_mesh_sharded_parity():
    """Replicates shard over the 8-device mesh with the SAME
    replicate-index -> key mapping: identical statistics to the
    single-device packed run (parity, not just statistical
    equivalence); loud contracts for indivisible B and for the
    non-packed paths."""
    from mlmc_tpu.parallel import SampleMesh

    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=2, min_bucket=64),
                      sim, [[0.1], [0.02]])
    sampler.set_initial_n_samples([1200, 300])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    q = make_root_quantity(storage, q_specs=sim.result_format())
    vq = q["length"][1]["10"][0]
    mfn = Legendre(5, distr.ppf([1e-6, 1 - 1e-6]))

    e1 = est_mod.Estimate(vq, storage, mfn)
    e1.est_bootstrap_fast(n_subsamples=32, seed=9, replace="poisson")
    solo = (e1.mean_bs_mean.copy(), e1.var_bs_l_means.copy())

    e8 = est_mod.Estimate(vq, storage, mfn)
    e8.est_bootstrap_fast(n_subsamples=32, seed=9, replace="poisson",
                          mesh=SampleMesh())
    np.testing.assert_allclose(e8.mean_bs_mean, solo[0], rtol=1e-12)
    np.testing.assert_allclose(e8.var_bs_l_means, solo[1], rtol=1e-10,
                               atol=1e-15)

    with pytest.raises(ValueError, match="divide"):
        e8.est_bootstrap_fast(n_subsamples=30, replace="poisson",
                              mesh=SampleMesh())
    with pytest.raises(ValueError, match="poisson"):
        e8.est_bootstrap_fast(n_subsamples=32, replace=True,
                              mesh=SampleMesh())
