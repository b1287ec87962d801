"""Shooting ODE MLMC in 2D (reference examples/shooting/shooting_2D.py).

A projectile under an independent random force field per axis; the QoI is
the final position (x, y) — a VECTOR quantity, post-processed through the
Quantity algebra: component extraction, a derived quantity (distance from
the origin via the numpy ufunc protocol), selection, and a maxent density
of the distance.

Run: python examples/shooting_2d.py
"""
import numpy as np

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.shooting import ShootingSimulation2D


def main():
    sim = ShootingSimulation2D(dict(
        start_position=(0.0, 0.0),
        start_velocity=(10.0, 5.0),
        area_borders=(-100.0, 200.0, -300.0, 400.0),
        max_time=10.0,
        complexity=20.0,
        fields_params=dict(model="gauss", corr_length=1.0, sigma=0.5,
                           log=False),
    ))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=11), sim,
                      level_parameters=[[0.1], [0.02]])
    sampler.set_initial_n_samples([2000, 400])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    position = quantity["target"][10]["0"]          # ArrayType (2,)
    x, y = position[0], position[1]

    # derived quantity through the ufunc protocol: distance from origin
    dist = np.sqrt(x * x + y * y)[0]  # ufunc results are ArrayType; take the scalar
    domain = est_mod.Estimate.estimate_domain(dist, storage, quantile=0.01)
    moments_fn = Legendre(9, domain)
    estimator = est_mod.Estimate(dist, storage, moments_fn)

    variances, n_ops = estimator.estimate_diff_vars_regression(
        sampler._n_scheduled_samples)
    n_opt = est_mod.estimate_n_samples_for_target_variance(
        1e-4, variances, n_ops, n_levels=2)
    print("optimal allocation for target_var=1e-4:", n_opt)

    means, variances = estimator.estimate_moments(moments_fn)
    print("distance moment means:", np.round(np.asarray(means[:5]), 4))

    # maxent density of the distance
    distr_obj, info, result, _ = estimator.construct_density(tol=1e-8)
    grid = np.linspace(domain[0], domain[1], 7)
    print("pdf(distance):", np.round(np.asarray(distr_obj.density(grid)), 4))


if __name__ == "__main__":
    main()
