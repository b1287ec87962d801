"""Debiased estimation and distribution functions beyond the telescope.

Two capabilities the truncated MLMC hierarchy cannot offer, each driven
on the GBM asset from the option-pricing example:

1. **Unbiased randomized MLMC** (Rhee-Glynn): randomize the truncation
   level and the estimate targets the CONTINUOUS-time Black-Scholes
   price exactly — no weak-bias/statistical-error balancing, just a
   standard error, at any budget.
2. **Multilevel CDF + quantiles** (Giles-Nagapetyan-Ritter): the full
   terminal-price distribution on a grid with error bars, Value-at-Risk
   style quantiles with delta-method standard errors — complementary to
   the moment-based maxent densities.

Run: python examples/unbiased_and_quantiles.py
"""
import numpy as np

from mlmc_tpu.cdf_estimate import MultilevelCDF, simulation_pair_fn
from mlmc_tpu.sim.sde import (SDESimulation, black_scholes_call,
                              european_call, gbm, terminal_value)
from mlmc_tpu.unbiased import (GeometricLevels, UnbiasedMLMC,
                               sde_unbiased_level_fn)

RATE, SIGMA, S0, STRIKE = 0.05, 0.2, 1.0, 1.05
DISCOUNT = float(np.exp(-RATE))


def unbiased_price(target_var=1e-6):
    """Price the call with zero discretization bias: Milstein coupling
    (beta ~ 2 > gamma ~ 1 per refinement) with a refine-4 ladder, whose
    optimal geometric ratio is 4^{-(2+1)/2} = 1/8 (short random level
    ladders keep the executable count small)."""
    sim = SDESimulation(dict(model=gbm(RATE, SIGMA, S0), scheme="milstein",
                             payoff=european_call(STRIKE, DISCOUNT)))
    mc = UnbiasedMLMC(sde_unbiased_level_fn(sim, n0=8, refine=4),
                      GeometricLevels(0.125),
                      estimator="coupled", seed=42, chunk_size=1024,
                      cost_fn=lambda lv: 4.0 ** lv)
    out = mc.run(target_var=target_var)
    exact = black_scholes_call(S0, STRIKE, RATE, SIGMA, 1.0)
    print("unbiased price  %.6f +- %.1e   (Black-Scholes %.6f, "
          "%d draws over %d random levels)"
          % (out["mean"], np.sqrt(out["var"]), exact, out["n_draws"],
             len(out["levels"])))
    return out


def terminal_distribution(target_var=1e-5):
    """CDF, PDF and quantiles of the terminal price S_T."""
    sim = SDESimulation(dict(model=gbm(RATE, SIGMA, S0),
                             payoff=terminal_value()))
    pair_fn, L = simulation_pair_fn(
        sim, [[1 / 4], [1 / 16], [1 / 64]])
    ml = MultilevelCDF(pair_fn, L, grid=np.linspace(0.5, 2.0, 151),
                       bandwidth=0.02, kernel_order=4, seed=7,
                       chunk_size=2048, cost_fn=lambda lv: 4.0 ** lv)
    ml.run(target_var=target_var)
    ps = [0.05, 0.5, 0.95]
    q, se = ml.quantiles(ps)
    # exact lognormal quantiles of the Euler limit ~ the true law
    import scipy.stats as st

    exact = S0 * np.exp((RATE - 0.5 * SIGMA ** 2) + SIGMA * st.norm.ppf(ps))
    for p, qi, si, ei in zip(ps, q, se, exact):
        print("S_T quantile %.2f: %.4f +- %.1e   (lognormal %.4f)"
              % (p, qi, si, ei))
    return q, se


def main():
    unbiased_price()
    terminal_distribution()


if __name__ == "__main__":
    main()
