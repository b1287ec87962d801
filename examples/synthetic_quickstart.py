"""Quick start: 2-level synthetic MLMC to a target variance + maxent PDF.

Mirrors the reference tutorial flow (docs/source/examples_*.rst,
test/test_run.py:43-107) on the device-batched runtime.

Run: python examples/synthetic_quickstart.py
"""
import numpy as np

from mlmc_tpu import Memory, SynthSimulation, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.random.distributions import Norm


def main():
    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2, nan_fraction=0.02))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=42), sim,
                      level_parameters=[[0.1], [0.001]])

    # initial samples + adaptive refinement to the target variance
    sampler.set_initial_n_samples([1000, 100])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    value = quantity["length"][1]["10"][0]  # quantity -> time -> location
    domain = est_mod.Estimate.estimate_domain(value, storage, quantile=0.001)
    moments_fn = Legendre(25, domain)
    estimator = est_mod.Estimate(value, storage, moments_fn)

    target_var = 1e-4
    variances, n_ops = estimator.estimate_diff_vars_regression(
        sampler._n_scheduled_samples)
    n_estimated = est_mod.estimate_n_samples_for_target_variance(
        target_var, variances, n_ops, n_levels=sampler.n_levels)
    while not sampler.process_adding_samples(n_estimated, 0, 0.1):
        variances, n_ops = estimator.estimate_diff_vars_regression(
            sampler._n_scheduled_samples)
        n_estimated = est_mod.estimate_n_samples_for_target_variance(
            target_var, variances, n_ops, n_levels=sampler.n_levels)

    means, est_vars = estimator.estimate_moments(moments_fn)
    print("collected:", storage.get_n_collected())
    print("moment means[:5]:", np.asarray(means)[:5])

    # maxent PDF reconstruction from the estimated moments
    distr_obj, info, result, _ = estimator.construct_density(tol=1e-8)
    grid = np.linspace(domain[0], domain[1], 9)
    print("density on grid:", distr_obj.density(grid).round(4))


if __name__ == "__main__":
    main()
