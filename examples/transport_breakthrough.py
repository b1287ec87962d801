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

    # breakthrough curve: telescoped MLMC mean at every observation time
    curve = root["conc_flux"]
    mean_curve = []
    for t in obs:
        q = curve[t]["outflow"][0]
        domain = est_mod.Estimate.estimate_domain(q, storage, quantile=0.01)
        mfn = Legendre(4, domain)
        est = est_mod.Estimate(q, storage, mfn)
        means, _ = est.estimate_moments(mfn)
        mean_curve.append(float(means[1]))
    print("obs times :", np.round(obs, 3))
    print("mean curve:", np.round(mean_curve, 5),
          "(Legendre moment 1 on the estimation domain)")

    # scalar QoI at one time, as the reference extracts a single flux
    import mlmc_tpu.quantity.quantity_estimate as qe
    t_obs = obs[len(obs) // 2]
    q = curve[t_obs]["outflow"][0]
    m = qe.estimate_mean(q)
    print("flux at t=%.3g: mean %.5f, var of mean %.3g"
          % (t_obs, float(np.asarray(m.mean)), float(np.asarray(m.var))))


if __name__ == "__main__":
    main()
