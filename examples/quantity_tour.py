"""Tour of the Quantity post-processing algebra (docs/quantity.md, runnable).

Covers the surface of the reference's largest tutorial
(docs examples_quantity.rst): structured access by name/time/location/
array index, time interpolation, arithmetic and ufuncs, comparisons,
selection (eager ``select`` vs traceable ``mask``), bootstrap subsampling,
and moment/covariance estimation — over samples produced by a real
device-batched MLMC run.

Run: python examples/quantity_tour.py
"""
import numpy as np

from mlmc_tpu import (Memory, SynthSimulation, DeviceBatchPool, Sampler,
                      Legendre, Quantity)
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
import mlmc_tpu.quantity.quantity_estimate as qe
from mlmc_tpu.random.distributions import Norm


def main():
    # ---------------------------------------------------------------- #
    # collect some samples (2-level synthetic run)
    # ---------------------------------------------------------------- #
    sim = SynthSimulation(dict(distr=Norm()))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=11), sim,
                      level_parameters=[[0.1], [0.01]])
    sampler.set_initial_n_samples([3000, 800])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    # ---------------------------------------------------------------- #
    # structured access: Dict -> TimeSeries -> Field -> Array
    # ---------------------------------------------------------------- #
    root = make_root_quantity(storage, q_specs=sim.result_format())
    length = root["length"]                 # quantity by name
    at_t1 = length[1]                       # by time
    location = at_t1["10"]                  # by location name
    value = location[0]                     # array indexing -> scalar view
    interp = length.time_interpolation(2.5)  # linear between stored times
    print("root size:", root.size(), "| scalar view size:", value.size())

    # ---------------------------------------------------------------- #
    # arithmetic, ufuncs, constants
    # ---------------------------------------------------------------- #
    work = 2 * value + 1                    # scalars broadcast
    smooth = np.sin(work)                   # numpy ufunc protocol
    const = Quantity.wrap(3.0)              # explicit constant node
    combo = smooth + const - 3.0
    mean = qe.estimate_mean(combo)
    print("E[sin(2X+1)] (telescoped):", float(np.squeeze(mean.mean)))

    # ---------------------------------------------------------------- #
    # comparisons -> selection
    # ---------------------------------------------------------------- #
    cond = (value < 2.0)                    # Bool-typed mask quantity
    subset = value.select(cond)             # removes samples (eager)
    masked = value.mask(cond)               # NaN-poisons (jit-traceable)
    m_sel = qe.estimate_mean(subset)
    m_msk = qe.estimate_mean(masked)
    print("select vs mask mean agree:",
          np.allclose(np.squeeze(m_sel.mean), np.squeeze(m_msk.mean)))
    print("samples dropped by mask:", m_msk.n_rm_samples.astype(int).tolist())

    # ---------------------------------------------------------------- #
    # bootstrap subsampling
    # ---------------------------------------------------------------- #
    sub = root.subsample([1000, 300])
    sub_mean = qe.estimate_mean(sub)
    print("subsample n per level:", sub_mean.n_samples.astype(int).tolist())

    # ---------------------------------------------------------------- #
    # moments + covariance + density
    # ---------------------------------------------------------------- #
    domain = est_mod.Estimate.estimate_domain(value, storage, quantile=0.001)
    mfn = Legendre(12, domain)
    mom = qe.estimate_mean(qe.moments(value, mfn))
    cov = qe.estimate_mean(qe.covariance(value, mfn))
    print("moment means[:4]:", np.round(np.asarray(mom.mean[:4]), 4))
    print("cov diagonal[:4]:",
          np.round(np.diag(np.asarray(cov.mean))[:4], 4))

    est = est_mod.Estimate(value, storage, mfn)
    distr, info, result, _ = est.construct_density(tol=1e-8)
    grid = np.linspace(domain[0], domain[1], 7)
    print("maxent pdf on grid:", np.round(distr.density(grid), 4))


if __name__ == "__main__":
    main()
