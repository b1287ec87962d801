"""Darcy diffusion MLMC on a device mesh (cond_field, BASELINE config 5).

Random log-normal conductivity field on the unit square, on-device CG
pressure solve, QoI = effective conductivity. Runs the sampling as a
sharded device batch over all available chips (or the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/diffusion_pod.py).
"""
import numpy as np

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.diffusion import DiffusionSimulation
from mlmc_tpu.parallel import SampleMesh, multihost


def main():
    multihost.initialize(num_processes=1)
    mesh = multihost.global_sample_mesh()
    print("sampling over", mesh.n_devices, "devices")

    sim = DiffusionSimulation(dict(sigma=1.0, corr_length=0.3, n_modes=128))
    storage = Memory()
    sampler = Sampler(storage,
                      DeviceBatchPool(seed=3, sharding=mesh, min_bucket=32),
                      sim, level_parameters=[[1 / 8], [1 / 32]])
    sampler.set_initial_n_samples([256, 64])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    flux = quantity["flux"][0]["outflow"][0]
    domain = est_mod.Estimate.estimate_domain(flux, storage, quantile=0.01)
    moments_fn = Legendre(7, domain)
    estimator = est_mod.Estimate(flux, storage, moments_fn)
    means, variances = estimator.estimate_moments(moments_fn)

    if multihost.is_coordinator():
        print("effective-conductivity moment means:", np.round(means[:4], 4))
        print("per-level cost [s/sample]:", storage.get_n_ops())


if __name__ == "__main__":
    main()
