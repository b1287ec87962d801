"""02_conc-style solute-transport MLMC (reference test/02_conc/proc_conc.py).

Darcy flow through a random log-normal medium plus upwind FV solute
transport from a source ("repo") block; the quantity of interest is the
solute mass outflux through the outflow edge — estimated both as the full
breakthrough curve and, like the reference's ``_extract_result``, as the
flux at a chosen observation time.

    python examples/transport_breakthrough.py
"""
import numpy as np

from mlmc_tpu import (Memory, DeviceBatchPool, Sampler, Legendre,
                      make_root_quantity)
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.sim.transport import TransportSimulation


def main():
    sim = TransportSimulation(dict(sigma=1.0, corr_length=0.3,
                                   field_method="circulant"))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=11, min_bucket=64), sim,
                      [[1 / 4], [1 / 16], [1 / 64]])
    sampler.set_initial_n_samples([512, 128, 32])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, q_specs=sim.result_format())
    obs = sim.result_format()[0].times

    # breakthrough curve: ONE telescoped MLMC mean over the whole
    # time-series quantity (the mean/var vectors carry every obs time)
    import mlmc_tpu.quantity.quantity_estimate as qe
    curve = root["conc_flux"]
    m = qe.estimate_mean(curve)
    mean_curve = np.ravel(np.asarray(m.mean))
    sem_curve = np.sqrt(np.ravel(np.asarray(m.var)))
    print("obs times :", np.round(obs, 3))
    print("mean curve:", np.round(mean_curve, 5))
    print("std errors:", np.round(sem_curve, 6))

    # scalar QoI at one time, as the reference extracts a single flux —
    # between observation points the DAG interpolates
    t_obs = 0.5 * (obs[3] + obs[4])
    q = curve.time_interpolation(t_obs)["outflow"][0]
    ms = qe.estimate_mean(q)
    print("flux at t=%.3g: mean %.5f, var of mean %.3g"
          % (t_obs, float(np.ravel(np.asarray(ms.mean))[0]),
             float(np.ravel(np.asarray(ms.var))[0])))

    # moment-based density of the mid-time flux (reference-style analysis)
    domain = est_mod.Estimate.estimate_domain(q, storage, quantile=0.01)
    est = est_mod.Estimate(q, storage, Legendre(10, domain))
    means, variances = est.estimate_moments(Legendre(10, domain))
    assert means[0] == 1 and variances[0] == 0


if __name__ == "__main__":
    main()
