"""Fractured Darcy flow MLMC — the device-native fracture workflow.

The reference runs fractured-domain MLMC through geomop + gmsh +
flow123d (reference mlmc/random/frac_geom.py, test/fixtures/mlmc_test_run
flow configs); here the fracture network is sampled, rasterized into the
conductivity grid, and solved on device (see
mlmc_tpu/random/frac_geom.py), so the whole study is three jitted
programs.

Estimates the effective conductivity distribution of a 1e3-contrast
fractured lognormal medium across a 16^2 -> 64^2 level hierarchy.

Run: python examples/fractured_darcy.py [--tiny]
"""
import sys

import numpy as np

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.random.frac_geom import FracturedDiffusionSimulation


def main(tiny=False):
    sim = FracturedDiffusionSimulation(dict(
        sigma=1.0, corr_length=0.3, field_method="circulant",
        n_fractures=8 if tiny else 24, frac_contrast=1e3))
    storage = Memory()
    levels = [[1 / 8], [1 / 16]] if tiny else [[1 / 16], [1 / 32], [1 / 64]]
    sampler = Sampler(storage, DeviceBatchPool(seed=7), sim,
                      level_parameters=levels)

    sampler.set_initial_n_samples([32, 16] if tiny else [512, 128, 32])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    flux = quantity["flux"][0]["outflow"][0]
    domain = est_mod.Estimate.estimate_domain(flux, storage, quantile=0.01)
    moments_fn = Legendre(9 if tiny else 19, domain)
    estimator = est_mod.Estimate(flux, storage, moments_fn)

    means, est_vars = estimator.estimate_moments(moments_fn)
    from mlmc_tpu.quantity import quantity_estimate as qe
    flux_mean = qe.estimate_mean(flux)
    print("collected per level:", storage.get_n_collected())
    print("effective conductivity: %.4f +- %.4f"
          % (float(np.squeeze(flux_mean.mean)),
             float(np.sqrt(np.squeeze(flux_mean.var)))))
    print("moment means[:4]:", np.round(np.asarray(means)[:4], 4))

    if not tiny:
        distr_obj, info, result, _ = estimator.construct_density(tol=1e-7)
        grid = np.linspace(domain[0], domain[1], 7)
        print("pdf on grid:", distr_obj.density(grid).round(3))


if __name__ == "__main__":
    main(tiny="--tiny" in sys.argv[1:])
