"""Option pricing with multilevel Monte Carlo over SDE paths.

The workload MLMC was invented for (Giles 2008), absent from the
reference library: a GBM asset under the risk-neutral measure, a
European call priced three ways —

1. adaptive MLMC (FusedMLMC streaming driver, Milstein coupling),
2. antithetic MLMC on the order-sensitive Asian payoff,
3. multilevel QMC through the Brownian-bridge adapter,

each checked against the Black-Scholes closed form.

Run: python examples/sde_option_pricing.py
"""
import numpy as np

from mlmc_tpu.fused_driver import FusedMLMC, sim_level_chunk_fns
from mlmc_tpu.moments import Legendre
from mlmc_tpu.qmc import MLQMC
from mlmc_tpu.sim.sde import (SDESimulation, asian_call, black_scholes_call,
                              european_call, gbm, sde_qmc_level_fns)

RATE, SIGMA, S0, STRIKE = 0.05, 0.2, 1.0, 1.0
DISCOUNT = float(np.exp(-RATE))
STEPS = [[1 / 4], [1 / 16], [1 / 64], [1 / 256]]


def mlmc_european():
    """Adaptive MLMC to target_var=1e-8 with the Milstein coupling."""
    sim = SDESimulation(dict(model=gbm(RATE, SIGMA, S0), scheme="milstein",
                             payoff=european_call(STRIKE, DISCOUNT)))
    fns = sim_level_chunk_fns(sim, STEPS)
    a, b = -0.5, 2.0                       # payoff domain for the moments
    driver = FusedMLMC(fns, Legendre(2, (a, b)), chunk_size=1 << 14)
    est = driver.run(target_var=1e-8, initial_n=(20_000, 2_000))
    # est["mean"] is the telescoped MOMENT vector; Legendre P1 is the
    # linear map t = (2x - a - b)/(b - a), so the price inverts it
    price = float((a + b) / 2 + (b - a) / 2 * est["mean"][1])
    bs = black_scholes_call(S0, STRIKE, RATE, SIGMA, 1.0)
    print("MLMC European call: %.6f  (Black-Scholes %.6f, err %.1e, "
          "n per level %s)" % (price, bs, abs(price - bs),
                               list(est["n_samples"])))


def antithetic_asian():
    """The Giles-Szpruch antithetic twin on the (order-sensitive) Asian
    payoff: compare measured level variances with the plain estimator."""
    from mlmc_tpu.sim.sde import coupled_path_functionals
    import jax

    payoff = asian_call(STRIKE, DISCOUNT)
    keys = jax.random.split(jax.random.key(0), 1 << 15)
    for anti in (False, True):
        cfg = dict(model=gbm(RATE, SIGMA, S0), scheme="milstein",
                   total_time=1.0, n_fine=64, n_coarse=32, antithetic=anti)
        pf_f, pf_fa, pf_c = jax.jit(
            lambda k: coupled_path_functionals(cfg, keys=k))(keys)
        v = payoff(pf_f)
        if anti:
            v = 0.5 * (v + payoff(pf_fa))
        d = np.asarray(v - payoff(pf_c))
        print("Asian level (64|32) %-10s V_l = %.3e"
              % ("antithetic" if anti else "plain", d.var()))


def qmc_european():
    """Multilevel QMC: Brownian-bridge Sobol' points, 12 randomizations."""
    sim = SDESimulation(dict(model=gbm(RATE, SIGMA, S0), scheme="milstein",
                             payoff=european_call(STRIKE, DISCOUNT)))
    fns, dims = sde_qmc_level_fns(sim, STEPS[:3])
    ml = MLQMC(fns, dims, n_randomizations=12, seed=7, chunk_size=1 << 11)
    res = ml.run(target_var=1e-9, n_init=1 << 11)
    bs = black_scholes_call(S0, STRIKE, RATE, SIGMA, 1.0)
    print("MLQMC European call: %.6f  (Black-Scholes %.6f, err %.1e, "
          "%d evaluations, QMC-vs-MC gains %s)"
          % (res["mean"], bs, abs(res["mean"] - bs),
             int(np.sum(res["n_evaluations"])),
             [round(float(g)) for g in res["mc_variance_reduction"]]))


def main():
    mlmc_european()
    antithetic_asian()
    qmc_european()


if __name__ == "__main__":
    main()
