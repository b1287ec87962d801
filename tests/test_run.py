"""End-to-end adaptive MLMC loop (mirrors reference test/test_run.py:43-107).

Matrix: {Memory} x {OneProcessPool, DeviceBatchPool}; HDF storage joins the
matrix in test_storage_hdf once that backend lands. Asserts the trivial
moment invariants (means[0]==1, vars[0]==0) plus statistical closeness of
the estimated mean to the true distribution mean.
"""
import numpy as np
import pytest

import mlmc_tpu
from mlmc_tpu import Memory, SynthSimulation, OneProcessPool, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.random.distributions import Norm


@pytest.mark.parametrize("pool_factory", [OneProcessPool, DeviceBatchPool])
def test_mlmc_adaptive(pool_factory):
    np.random.seed(1234)
    n_moments = 5
    step_range = [[0.1], [0.001]]
    distr = Norm()

    simulation_factory = SynthSimulation(dict(distr=distr, complexity=2, nan_fraction=0.05))
    sample_storage = Memory()
    sampling_pool = pool_factory()

    sampler = Sampler(
        sample_storage=sample_storage,
        sampling_pool=sampling_pool,
        sim_factory=simulation_factory,
        level_parameters=step_range,
    )

    true_domain = distr.ppf([0.0001, 0.9999])
    moments_fn = Legendre(n_moments, true_domain)

    sampler.set_initial_n_samples([50, 50])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    target_var = 1e-3
    quantity = make_root_quantity(sample_storage, q_specs=simulation_factory.result_format())
    length = quantity["length"]
    time = length[1]
    location = time["10"]
    value_quantity = location[0]

    estimator = est_mod.Estimate(value_quantity, sample_storage, moments_fn)

    variances, n_ops = estimator.estimate_diff_vars_regression(sampler._n_scheduled_samples)
    n_estimated = est_mod.estimate_n_samples_for_target_variance(
        target_var, variances, n_ops, n_levels=sampler.n_levels
    )

    n_rounds = 0
    while not sampler.process_adding_samples(n_estimated, 0, 0.1):
        variances, n_ops = estimator.estimate_diff_vars_regression(sampler._n_scheduled_samples)
        n_estimated = est_mod.estimate_n_samples_for_target_variance(
            target_var, variances, n_ops, n_levels=sampler.n_levels
        )
        n_rounds += 1
        assert n_rounds < 100

    means, vars = estimator.estimate_moments(moments_fn)
    assert means[0] == 1
    assert vars[0] == 0
    # statistical sanity: first Legendre moment is a linear map of the mean;
    # true mean of sample_fn(x, h) is ~ h*E[sqrt(1e-4+|x|)] ~ small
    assert np.abs(means[1]) < 0.1


def test_moment_accuracy_large_batch():
    """Device pool at larger scale: estimate matches exact Legendre moments.

    Single level, no numerical error (h=tiny), normal distribution: moment
    means must match quadrature values within CLT tolerance.
    """
    import scipy.integrate as integrate

    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = Memory()
    pool = DeviceBatchPool(seed=11)
    sampler = Sampler(storage, pool, sim, [[1e-8]])
    n = 200000
    sampler.set_initial_n_samples([n])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    domain = distr.ppf([1e-8, 1 - 1e-8])
    mfn = Legendre(8, domain)
    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    value_q = quantity["length"][1]["10"][0]
    estimator = est_mod.Estimate(value_q, storage, mfn)
    means, variances = estimator.estimate_moments(mfn)

    exact = np.array(
        [
            integrate.quad(
                lambda x, i=i: np.asarray(mfn.eval_all(np.array([x]))[0, i]) * distr.pdf(x),
                domain[0],
                domain[1],
            )[0]
            for i in range(8)
        ]
    )
    err = np.abs(np.asarray(means) - exact)
    tol = 5 * np.sqrt(np.asarray(variances)) + 1e-8
    assert np.all(err < np.maximum(tol, 5e-3)), (err, tol)
