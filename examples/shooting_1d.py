"""Shooting ODE MLMC (reference examples/shooting/shooting_1D.py:18-244).

A projectile under a random force field; QoI = final height. 2-level run
with variance-optimal allocation and bootstrap confidence intervals.

Run: python examples/shooting_1d.py
"""
import numpy as np

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.shooting import ShootingSimulation1D


def main():
    sim = ShootingSimulation1D(dict(
        start_position=(0.0, 0.0),
        start_velocity=(10.0, 0.0),
        area_borders=(-100.0, 200.0, -300.0, 400.0),
        max_time=10.0,
        complexity=20.0,
        fields_params=dict(model="gauss", corr_length=1.0, sigma=0.5,
                           log=False),
    ))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=7), sim,
                      level_parameters=[[0.1], [0.02]])
    sampler.set_initial_n_samples([2000, 400])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    final_y = quantity["target"][10]["0"][0]
    domain = est_mod.Estimate.estimate_domain(final_y, storage, quantile=0.01)
    moments_fn = Legendre(9, domain)
    estimator = est_mod.Estimate(final_y, storage, moments_fn)

    # variance-optimal allocation from measured per-level costs
    variances, n_ops = estimator.estimate_diff_vars_regression(
        sampler._n_scheduled_samples)
    n_opt = est_mod.estimate_n_samples_for_target_variance(
        1e-4, variances, n_ops, n_levels=2)
    print("optimal allocation for target_var=1e-4:", n_opt)

    # bootstrap confidence intervals
    estimator.est_bootstrap(n_subsamples=100, sample_vector=[1000, 200])
    means = estimator.mean_bs_mean
    ci = 1.96 * np.sqrt(estimator.var_bs_mean)
    print("moment means:", np.round(means[:5], 4))
    print("bootstrap 95% CI half-widths:", np.round(ci[:5], 4))


if __name__ == "__main__":
    main()
