"""Surrogates, spectral quadrature and rare events on one Darcy model.

Four capabilities beyond sampling estimators, all driven on the same
32x32 Darcy flow cell with an 8-parameter random log-conductivity:

1. **Sparse-grid collocation**: E[flux] with spectral accuracy from a
   few hundred solves — no statistical error at all.
2. **Polynomial chaos**: a degree-3 spectral surrogate fitted from one
   batch of solves; its coefficients give variance and Sobol'
   attribution in closed form, and the surrogate itself is a jittable
   stand-in model.
3. **Surrogate-accelerated MFMC**: the PCE surrogate as a ~free
   low-fidelity model — most of the budget shifts onto the surrogate.
4. **Subset simulation**: P[flux > gamma] for a threshold far in the
   tail, where plain Monte Carlo at this budget would see zero hits.

Run: python examples/surrogates_and_rare_events.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.collocation import SparseGrid
from mlmc_tpu.mcmc import make_darcy_inverse
from mlmc_tpu.multifidelity import MFMC
from mlmc_tpu.pce import PCE
from mlmc_tpu.rare import subset_simulation


def main():
    prob = make_darcy_inverse([32], n_modes=4, sigma=1.0)
    d = prob["d"]
    flux = lambda th: prob["forward"](th, 32)[1]

    # 1. sparse-grid collocation: deterministic E[flux]
    grid = SparseGrid(d, 3, rule="gauss-hermite")
    e_flux = float(grid.integrate(flux))
    print(f"collocation  E[flux] = {e_flux:.5f}  "
          f"({grid.n_nodes} solves, no statistical error)")

    # 2. PCE surrogate + spectral Sobol attribution
    theta = jax.random.normal(jax.random.key(0), (1024, d))
    pce = PCE(d, 3).fit_regression(theta, jax.vmap(flux)(theta))
    sob = pce.sobol()
    print(f"PCE          mean {pce.mean():.5f}  var {pce.var():.3e}")
    print("             Sobol first-order:",
          np.round(sob["first_order"], 3))

    # 3. the surrogate as an MFMC low-fidelity model
    def hi(keys):
        th = jax.vmap(lambda k: jax.random.normal(k, (d,)))(keys)
        return jax.vmap(flux)(th)

    def lo(keys):
        th = jax.vmap(lambda k: jax.random.normal(k, (d,)))(keys)
        return pce(th)

    mf = MFMC([hi, lo], costs=[1.0, 1e-3], seed=5)
    st = mf.pilot(1 << 12)
    out = mf.estimate(budget=2e4)
    print(f"MFMC+PCE     mean {float(out['mean']):.5f}  "
          f"rho {float(st['rho'][1]):.4f}  "
          f"speedup vs plain MC {float(out['speedup']):.1f}x")

    # 4. rare tail: P[flux > mu + 4.5 sd(log flux)]
    lg = np.log(np.asarray(jax.device_get(jax.vmap(flux)(theta))))
    gamma = float(np.exp(lg.mean() + 4.5 * lg.std()))
    rare = subset_simulation(flux, gamma=gamma, d=d, n_particles=2048,
                             key=jax.random.key(1))
    print(f"subset sim   P[flux > {gamma:.3f}] = {rare['p']:.3g}  "
          f"(band {rare['p_lo']:.2g}..{rare['p_hi']:.2g}, "
          f"{rare['n_stages']} rungs, {rare['n_forward']} solves)")


if __name__ == "__main__":
    main()
