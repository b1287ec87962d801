"""Global sensitivity analysis: which inputs drive Var(Q)?

First-order and total-effect Sobol' indices of the Ishigami benchmark
(known closed forms) via Saltelli's pick-freeze design on the on-device
scrambled-Sobol engine, then the multilevel variant: a cheap surrogate
carries the bulk of the design and a small fine-model correction
telescopes the indices to the fine model (Mycek & Le Maître 2019).

Beyond-reference capability — the reference mlmc library has no
sensitivity analysis. Run: python examples/sensitivity_ishigami.py
"""
import numpy as np
import jax.numpy as jnp

from mlmc_tpu import sobol_indices, sobol_indices_mlmc

A, B = 7.0, 0.1


def ishigami(u):
    x = 2 * jnp.pi * u - jnp.pi                  # U(-pi, pi)^3
    return (jnp.sin(x[:, 0]) + A * jnp.sin(x[:, 1]) ** 2
            + B * x[:, 2] ** 4 * jnp.sin(x[:, 0]))


def surrogate(u):
    """A cheap model: drops the x1-x3 interaction term."""
    x = 2 * jnp.pi * u - jnp.pi
    return jnp.sin(x[:, 0]) + A * jnp.sin(x[:, 1]) ** 2


def exact():
    v1 = 0.5 * (1 + B * np.pi ** 4 / 5) ** 2
    v2 = A ** 2 / 8
    v13 = 8 * B ** 2 * np.pi ** 8 / 225
    v = v1 + v2 + v13
    return np.array([v1, v2, 0.0]) / v, np.array([v1 + v13, v2, v13]) / v


def main():
    s_exact, st_exact = exact()

    res = sobol_indices(ishigami, dim=3, n=1 << 15, n_randomizations=16)
    print("single-level (%d model evaluations):" % res.n_evaluations)
    print("  S   ", res.first_order.round(4), " exact", s_exact.round(4))
    print("  S_T ", res.total_effect.round(4), " exact", st_exact.round(4))
    print("  standard errors <=", float(max(res.first_order_se.max(),
                                            res.total_effect_se.max())))

    ml = sobol_indices_mlmc(
        [lambda u: (surrogate(u), jnp.zeros(u.shape[0])),
         lambda u: (ishigami(u), surrogate(u))],
        dim=3, n_per_level=[1 << 15, 1 << 12], n_randomizations=16)
    print("multilevel (surrogate bulk + 1/8-size fine correction):")
    print("  S   ", ml.first_order.round(4))
    print("  S_T ", ml.total_effect.round(4))


if __name__ == "__main__":
    main()
