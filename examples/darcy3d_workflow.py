"""3-D Darcy flow on the unit cube, end to end.

The reference's flagship cond_field workflow in THREE dimensions —
which it reaches only through PBS-clustered flow123d jobs at ~10-20
minutes per sample. Here the whole adaptive study runs on one chip:

1. adaptive MLMC to a target variance over an 8³/16³/32³ hierarchy
   (7-point FV, spectral-preconditioned CG, RFF log-normal fields),
   with convergence-rate diagnostics,
2. maximum-entropy density of the effective conductivity,
3. the fractured variant: penny-shaped disc networks at 1e3 contrast
   under the 3-D multigrid V-cycle.

Run: python examples/darcy3d_workflow.py
"""
import numpy as np

import mlmc_tpu.estimator as est_mod
import mlmc_tpu.quantity.quantity_estimate as qe
from mlmc_tpu import (DeviceBatchPool, Legendre, Memory, Sampler,
                      make_root_quantity)
from mlmc_tpu.random.frac_geom import FracturedDiffusionSimulation3D
from mlmc_tpu.sim.diffusion3d import DiffusionSimulation3D


def adaptive_study(target_var=2e-5):
    sim = DiffusionSimulation3D(dict(sigma=1.0, corr_length=0.3))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=11), sim,
                      [[1 / 8], [1 / 16], [1 / 32]])
    sampler.set_initial_n_samples([512, 128, 32])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, sim.result_format())
    q = root["flux"][0]["outflow"][0]
    est = est_mod.Estimate(q, storage, Legendre(10, (0.05, 6.0)))
    rounds = 0
    while rounds < 8:
        raw_vars, _ns = est.estimate_diff_vars_fast()
        variances, n_ops = est.estimate_diff_vars_regression(
            sampler._n_scheduled_samples, raw_vars=raw_vars)
        n_est = est_mod.estimate_n_samples_for_target_variance(
            target_var, variances, n_ops, n_levels=sampler.n_levels)
        if sampler.process_adding_samples(n_est, 0, 0.3):
            break
        rounds += 1
    m = qe.estimate_mean(q)
    rates = est_mod.estimate_convergence_rates(
        m.l_means, m.l_vars, storage.get_level_parameters(),
        storage.get_n_ops())
    print("E[K_eff] = %.5f  (Matheron exp(1/6) = %.5f)"
          % (float(np.ravel(np.asarray(m.mean))[0]), np.exp(1 / 6)))
    print("n per level = %s, alpha = %.2f, beta = %.2f"
          % ([int(v) for v in storage.get_n_collected()],
             rates["alpha"], rates["beta"]))
    distr, _info, _result, _mobj = est.construct_density_fast()
    x = np.linspace(0.4, 2.6, 5)
    print("maxent pdf at", list(np.round(x, 2)), "=",
          [round(float(v), 4) for v in distr.density(x)])


def fractured_study():
    sim = FracturedDiffusionSimulation3D(
        dict(sigma=0.5, corr_length=0.4, n_fractures=24,
             frac_contrast=1e3))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=13), sim,
                      [[1 / 8], [1 / 16]])
    sampler.set_initial_n_samples([128, 64])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    root = make_root_quantity(storage, sim.result_format())
    mean = qe.estimate_mean(root["flux"])
    m = float(np.asarray(mean.mean).ravel()[0])
    print("fractured E[K_eff] = %.4f (fractures conduct: above the "
          "unfractured bulk)" % m)


def main():
    adaptive_study()
    fractured_study()


if __name__ == "__main__":
    main()
