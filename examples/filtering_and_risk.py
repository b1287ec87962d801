"""Sequential inference and tail risk on one market story.

Three round-3 tiers driven end to end:

1. **Particle filtering** (`mlmc_tpu.particle`): track latent
   stochastic volatility through a non-Gaussian observation model —
   the bootstrap filter's home turf (an EnKF analysis is biased here
   at any ensemble size) — with the unbiased marginal likelihood and
   island error bars.
2. **Multilevel VaR/CVaR** (`mlmc_tpu.risk`): tail risk of the GBM
   terminal loss at MLMC cost, checked against the lognormal closed
   forms.
3. **CVaR-optimal hedging** (`mlmc_tpu.risk.optimize_cvar`): choose a
   put-option hedge ratio by minimizing CVaR through the
   Rockafellar-Uryasev program — the whole stochastic-gradient loop
   (all levels' pathwise value+grad, the optax update) runs as ONE
   jitted scan.

Run: python examples/filtering_and_risk.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.cdf_estimate import simulation_pair_fn
from mlmc_tpu.particle import particle_filter
from mlmc_tpu.risk import cvar_mlmc, optimize_cvar
from mlmc_tpu.sim.sde import SDESimulation, gbm, terminal_value

RATE, SIGMA, ALPHA = 0.05, 0.2, 0.95


def track_volatility(T=300, n_particles=1 << 14):
    """Latent log-volatility x_t = phi x_{t-1} + sig w_t observed only
    through returns y_t ~ N(0, exp(x_t))."""
    phi, sig = 0.98, 0.16
    rng = np.random.default_rng(3)
    x, truth, ys = 0.0, [], []
    for _ in range(T):
        x = phi * x + sig * rng.standard_normal()
        truth.append(x)
        ys.append(np.exp(0.5 * x) * rng.standard_normal())
    truth, ys = np.array(truth), np.array(ys)[:, None]

    out = particle_filter(
        lambda xx, key, t: phi * xx + sig * jax.random.normal(
            key, xx.shape, xx.dtype),
        lambda xx, y: -0.5 * (xx[0] + y[0] * y[0] * jnp.exp(-xx[0])),
        ys, n_particles=n_particles, d=1, key=jax.random.key(5),
        x0_sampler=lambda kk: sig / np.sqrt(1 - phi ** 2)
        * jax.random.normal(kk, (n_particles, 1)))
    rmse = float(np.sqrt(np.mean((out["means"][:, 0] - truth) ** 2)))
    print("volatility tracking: rmse %.3f (prior sd %.3f), "
          "loglik %.1f, resampled %.0f%% of cycles"
          % (rmse, sig / np.sqrt(1 - phi ** 2), out["loglik"],
             100 * out["resample_frac"]))
    return out


def tail_risk():
    """95% VaR/CVaR of the short position's terminal loss -S_T."""
    sim = SDESimulation(dict(model=gbm(RATE, SIGMA, 1.0),
                             payoff=terminal_value()))
    fwd, L = simulation_pair_fn(
        sim, [[1 / 4], [1 / 16], [1 / 64], [1 / 256]])

    def loss_pair(level, keys):
        f, c, v = fwd(level, keys)
        return -f, -c, v

    out = cvar_mlmc(loss_pair, L, ALPHA, target_se=2e-3,
                    bandwidth=[0.08, 0.04, 0.02, 0.01],
                    kernel_order=4, chunk_size=1 << 13, seed=7,
                    cost_fn=lambda lv: 4.0 ** lv)
    # lognormal closed forms for the finest-level limit
    from math import erf, sqrt
    mu_ln = RATE - 0.5 * SIGMA ** 2
    z = -1.6448536269514722           # Phi^{-1}(0.05)
    var_exact = -np.exp(mu_ln + SIGMA * z)
    cvar_exact = (-np.exp(mu_ln + 0.5 * SIGMA ** 2)
                  * 0.5 * (1 + erf((z - SIGMA) / sqrt(2)))
                  / (1 - ALPHA))
    print("VaR  %.4f (exact %.4f +- %.1g)" % (out["var"], var_exact,
                                              out["var_se"]))
    print("CVaR %.4f (exact %.4f +- %.1g)   n per level: %s"
          % (out["cvar"], cvar_exact, out["cvar_se"],
             out["n_per_level"].tolist()))
    return out, fwd, L


def optimal_hedge(fwd, L, unhedged_cvar):
    """Minimize CVaR_0.9 of the hedged loss -(S_T + h (K-S_T)+) + h p0
    over the hedge ratio h (put premium p0 = 0.08)."""

    def hedged(level, theta, keys):
        f, c, v = fwd(level, keys)
        h = theta[0]
        return (-(f + h * jnp.maximum(1.0 - f, 0.0)) + 0.08 * h,
                -(c + h * jnp.maximum(1.0 - c, 0.0)) + 0.08 * h, v)

    opt = optimize_cvar(hedged, jnp.array([0.0]), alpha=0.9,
                        n_levels=L, n_per_level=[4096, 2048, 1024, 512],
                        n_steps=250, smoothing=0.01,
                        key=jax.random.key(8))
    print("hedge ratio h* = %.3f: CVaR %.4f (unhedged %.4f), "
          "VaR at optimum %.4f"
          % (float(np.asarray(opt["theta"])[0]), opt["cvar"],
             unhedged_cvar, opt["t"]))
    return opt


def main():
    track_volatility()
    out, fwd, L = tail_risk()
    optimal_hedge(fwd, L, out["cvar"])


if __name__ == "__main__":
    main()
