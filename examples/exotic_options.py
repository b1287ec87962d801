"""Exotic option pricing: continuous monitoring and optimal stopping.

Payoffs that break naive path discretization, each handled by its
standard MLMC-compatible treatment (all beyond the reference library):

1. **Lookback** — the raw grid minimum is O(sqrt(h)) biased; the
   BGK-shifted minimum (``lookback_call_bb``) restores O(h) weak error.
   Checked against the Goldman-Sosin-Gatto closed form.
2. **Barrier knock-out** — the grid-crossing indicator misses
   within-step crossings; the Brownian-bridge survival product
   (``barrier_call_down_out``) is the conditional expectation of the
   continuous indicator. Checked against Merton's down-and-out form.
3. **Digital** — a 0/1 payoff destroys MLMC variance decay; the
   conditional-expectation smoothing (``digital_call_smoothed``, with
   the coarse path conditioned on the shared fine increments) restores
   beta ~ 3/2. Checked against exp(-rT) Phi(d2).
4. **Bermudan put** — optimal stopping by Longstaff-Schwartz
   regression (``lsmc_price``), the whole backward induction one
   jitted scan; bracketed by a CRR binomial tree on the same dates.

Run: python examples/exotic_options.py
"""
import numpy as np
import jax

from mlmc_tpu.sim.american import (bermudan_binomial, lsmc_price,
                                   put_payoff)
from mlmc_tpu.sim.sde import (
    barrier_call_down_out, barrier_down_out_call_price,
    black_scholes_digital, coupled_path_functionals,
    digital_call_smoothed, gbm, lookback_call_bb, lookback_call_price)

RATE, SIGMA, S0 = 0.05, 0.2, 1.0
DISCOUNT = float(np.exp(-RATE))
MODEL = gbm(RATE, SIGMA, S0)


def telescoped(payoff, extra=(), n_levels=4, n0=16, refine=4,
               N=1 << 15, seed=0):
    """Fixed-hierarchy Milstein telescope (the adaptive drivers in
    examples/sde_option_pricing.py apply unchanged; a fixed one keeps
    this walkthrough readable)."""
    total, var = 0.0, 0.0
    for lev in range(n_levels):
        nf = n0 * refine ** lev
        cfg = dict(model=MODEL, scheme="milstein", total_time=1.0,
                   n_fine=nf, n_coarse=0 if lev == 0 else nf // refine,
                   path_extras=True, **dict(extra))
        keys = jax.random.split(jax.random.key(seed + lev), N)
        pf_f, _, pf_c = jax.jit(
            lambda k, cfg=cfg: coupled_path_functionals(cfg, keys=k))(keys)
        d = np.asarray(payoff(pf_f)
                       - (payoff(pf_c) if pf_c is not None else 0.0))
        total += d.mean()
        var += d.var() / N
    return total, np.sqrt(var)


def main():
    est, se = telescoped(lookback_call_bb(DISCOUNT), seed=10)
    exact = lookback_call_price(S0, RATE, SIGMA, 1.0)
    print(f"lookback  (BGK shift):      {est:.6f} ± {se:.1e}  "
          f"closed form {exact:.6f}")

    est, se = telescoped(barrier_call_down_out(1.0, DISCOUNT),
                         extra=(("barrier", 0.85),), seed=20)
    exact = barrier_down_out_call_price(S0, 1.0, 0.85, RATE, SIGMA, 1.0)
    print(f"barrier   (bridge surv.):   {est:.6f} ± {se:.1e}  "
          f"closed form {exact:.6f}")

    est, se = telescoped(digital_call_smoothed(1.0, DISCOUNT), seed=30)
    exact = black_scholes_digital(S0, 1.0, RATE, SIGMA, 1.0)
    print(f"digital   (cond. expect.):  {est:.6f} ± {se:.1e}  "
          f"closed form {exact:.6f}")

    res = lsmc_price(put_payoff(1.0), S0, 0.06, 1.0, n_dates=16,
                     sigma=SIGMA, n_paths=1 << 16,
                     key=jax.random.key(3))
    tree = bermudan_binomial(S0, 1.0, 0.06, SIGMA, 1.0, n_dates=16,
                             n_steps=4096)
    print(f"bermudan  (LSMC, 16 dates): {res['price']:.6f} ± "
          f"{res['price_se']:.1e}  binomial {tree:.6f}  "
          f"(in-sample {res['price_insample']:.6f})")


if __name__ == "__main__":
    main()
