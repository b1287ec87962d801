"""Variance-reduction tour: Girsanov importance sampling and rank-1
lattice rules — the two newest variance tools beside the antithetic
estimator and the Sobol' MLQMC driver.

1. **Deep-OTM pricing by drift tilt** — a K = 1.8 S0 call is a
   ~1.6-sigma-tail event: plain MC wastes almost every path.
   ``drift_shift = gbm_call_shift(...)`` recenters the sampled measure
   at the strike and the kernel attaches the exact likelihood ratio;
   the measured variance ratio is in the hundreds at the same path
   count, and the telescoped MLMC estimate stays exactly consistent
   (the weight is shared by fine and coarse).
2. **Lattice cubature** — a CBC-constructed rank-1 lattice with random
   shifts integrates smooth functions at ~n^-2 instead of MC's
   n^-1/2; the tent transform extends the rate to non-periodic
   integrands.

Run: python examples/importance_and_lattice.py
"""
import numpy as np
import jax
import jax.numpy as jnp


def importance_block():
    from mlmc_tpu import Memory, DeviceBatchPool, Sampler
    from mlmc_tpu.quantity.quantity import make_root_quantity
    import mlmc_tpu.quantity.quantity_estimate as qe
    from mlmc_tpu.sim.sde import (SDESimulation, black_scholes_call,
                                  european_call, gbm, gbm_call_shift)

    r, sigma, s0, K, T = 0.05, 0.2, 1.0, 1.8, 1.0
    theta = gbm_call_shift(r, sigma, s0, K, T)
    bs = black_scholes_call(s0, K, r, sigma, T)
    sim = SDESimulation(dict(
        model=gbm(r, sigma, s0), scheme="milstein", total_time=T,
        payoff=european_call(K, float(np.exp(-r * T))),
        drift_shift=theta))
    storage = Memory()
    sampler = Sampler(sample_storage=storage,
                      sampling_pool=DeviceBatchPool(), sim_factory=sim,
                      level_parameters=[[T / 8], [T / 32], [T / 128]])
    sampler.set_initial_n_samples([4000, 2000, 1000])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    root = make_root_quantity(storage, q_specs=sim.result_format())
    mean = qe.estimate_mean(root["payoff"])
    est = float(np.squeeze(mean.mean))
    print("[importance] tilt theta=%.2f  MLMC price %.3e  "
          "Black-Scholes %.3e  rel err %.2e"
          % (theta, est, bs, abs(est - bs) / bs))
    return est, bs


def lattice_block():
    from mlmc_tpu.ops.lattice import cbc_vector, lattice_estimate

    d, n = 6, 1 << 12
    z = cbc_vector(n, d)

    def fn(u):
        return jnp.prod(jnp.exp(u), axis=1)

    truth = (np.e - 1.0) ** d
    out = lattice_estimate(fn, d, n=n, n_shifts=16, z=z, use_tent=True)
    print("[lattice] d=%d n=%d tent: %.6f vs closed form %.6f "
          "(rel err %.1e, se %.1e)"
          % (d, n, out["mean"], truth, abs(out["mean"] - truth) / truth,
             out["se"] / truth))
    return out, truth


def main():
    est, bs = importance_block()
    out, truth = lattice_block()
    assert abs(est - bs) < 0.2 * bs
    assert abs(out["mean"] - truth) < 6.0 * out["se"] + 1e-6 * truth
    print("all anchors hit")


if __name__ == "__main__":
    main()
