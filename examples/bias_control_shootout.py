"""Bias-control shoot-out: four ways to handle discretization bias.

One problem — the Euler-discretized GBM European call (exact answer:
Black-Scholes) — estimated by every bias-control strategy the framework
ships, so their trade-offs are directly comparable (all beyond the
reference library, whose adaptive loop fixes L and never balances bias
at all; reference mlmc/sampler.py, mlmc/estimator.py):

1. **Fixed-hierarchy telescope** (the reference's strategy): whatever
   bias the finest level has, you keep.
2. **ML2R** (`mlmc_tpu.ml2r`): reweight the SAME shallow hierarchy so
   the weak-bias expansion cancels to order h^((L+1)a).
3. **CMLMC** (`mlmc_tpu.cmlmc`): self-calibrate rates over a tolerance
   sequence, grow L until extrapolated bias fits the error contract.
4. **Unbiased randomized MLMC** (`mlmc_tpu.unbiased`): randomize the
   truncation level — ZERO bias at any budget, at the price of a
   heavier tail in the work distribution.
5. **Dual check (bonus)**: the Bermudan-put LSMC lower bound + Rogers
   dual upper bound bracket a price with NO closed form at all
   (`mlmc_tpu.sim.american`).

Run: python examples/bias_control_shootout.py
"""
import numpy as np
import jax

from mlmc_tpu import cmlmc, ml2r
from mlmc_tpu.cdf_estimate import simulation_pair_fn
from mlmc_tpu.sim.sde import (SDESimulation, black_scholes_call,
                              european_call, gbm)

RATE, SIGMA = 0.05, 0.2


def _sim():
    return SDESimulation(dict(
        model=gbm(RATE, SIGMA, 1.0), scheme="euler",
        payoff=european_call(1.0, float(np.exp(-RATE)))))


def telescope_and_ml2r():
    steps = [0.5, 0.25, 0.125]                  # deliberately shallow
    pair_fn, _ = simulation_pair_fn(_sim(), [[h] for h in steps])
    res = ml2r(pair_fn, steps, target_var=4e-10, alpha=1.0, seed=5,
               chunk_size=1 << 13)
    bs = black_scholes_call(1.0, 1.0, RATE, SIGMA, 1.0)
    print(f"  telescope (finest h=1/8):  err {abs(res['mean_mlmc']-bs):.2e}"
          f"  (its full c1*h weak bias)")
    print(f"  ML2R, same samples:        err {abs(res['mean']-bs):.2e}"
          f"  (se {res['se']:.1e}, {res['n_forward']:.2e} paths)")
    return bs


def continuation(bs):
    steps = [2.0 ** -k for k in range(1, 11)]
    pair_fn, _ = simulation_pair_fn(_sim(), [[h] for h in steps])
    res = cmlmc(pair_fn, steps, eps=5e-4, seed=3, n_stages=4,
                n_pilot=1 << 12, chunk_size=1 << 12)
    print(f"  CMLMC to eps=5e-4:         err {abs(res['mean']-bs):.2e}"
          f"  (bound {res['error_bound']:.1e}, L={res['n_levels']})")


def unbiased(bs):
    from mlmc_tpu.unbiased import (GeometricLevels, UnbiasedMLMC,
                                   sde_unbiased_level_fn)

    sim = SDESimulation(dict(
        model=gbm(RATE, SIGMA, 1.0), scheme="milstein",
        payoff=european_call(1.0, float(np.exp(-RATE)))))
    est = UnbiasedMLMC(sde_unbiased_level_fn(sim, n0=8, refine=4),
                       GeometricLevels(0.125), estimator="coupled",
                       seed=11)
    res = est.run(target_var=1e-8)
    se = float(np.sqrt(res["var"]))
    print(f"  Unbiased (Rhee-Glynn):     err {abs(res['mean']-bs):.2e}"
          f"  (se {se:.1e} — NO discretization bias)")


def dual_bracket():
    from mlmc_tpu.sim.american import (lsmc_dual_bound, lsmc_price,
                                       put_payoff)

    n_dates = 50
    lo = lsmc_price(put_payoff(1.0), 1.0, 0.06, 1.0, n_dates, sigma=0.2,
                    degree=3, n_paths=1 << 17, key=jax.random.key(2))
    # degree-5 global fits want the deeper path budget: at 2^17 the
    # f32 monomial normal equations already smear the surface and the
    # dual inflates ~2x (bench_american pins 2^18)
    surf = lsmc_price(put_payoff(1.0), 1.0, 0.06, 1.0, n_dates,
                      sigma=0.2, degree=5, n_paths=1 << 18,
                      itm_only=False, key=jax.random.key(5))
    up = lsmc_dual_bound(put_payoff(1.0), 1.0, 0.06, 1.0, n_dates,
                         coef=surf["coef"], sigma=0.2,
                         n_paths=1 << 13, n_inner=64,
                         key=jax.random.key(6))
    print(f"  Bermudan put bracket:      [{lo['price']:.5f}, "
          f"{up['upper']:.5f}]  (tree-free two-sided certificate)")


def main():
    print("Euler GBM European call — four bias-control strategies:")
    bs = telescope_and_ml2r()
    continuation(bs)
    unbiased(bs)
    print("No-closed-form bonus (Bermudan put):")
    dual_bracket()


if __name__ == "__main__":
    main()
