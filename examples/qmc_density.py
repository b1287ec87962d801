"""Multilevel quasi-Monte Carlo: target variance in thousands of points
instead of millions, then a maxent PDF from QMC moment estimates.

Beyond-reference capability (the reference mlmc library is pseudo-random
end to end): Owen-scrambled Sobol' points through the synthetic QoI via
the Giles-Waterhouse adaptive driver (docs/qmc.md), then the same driver
lifted to moment vectors feeding SimpleDistribution — the reference's
density workflow (mlmc/estimator.py:116-134) at QMC convergence rates.

Run: python examples/qmc_density.py
"""
import numpy as np

from mlmc_tpu.moments import Legendre
from mlmc_tpu.qmc import (MLQMC, moments_qmc_level_fns,
                          qmc_level_fns_from_normals, synth_qmc_level_fns)
import mlmc_tpu.tool.simple_distribution as sd


def scalar_qoi():
    """Part 1: the 5-level synthetic QoI to target_var=1e-10."""
    level_params = [[2.0 ** -i] for i in range(5)]
    fns, dims = synth_qmc_level_fns(level_params, distr="norm")
    ml = MLQMC(fns, dims, n_randomizations=16, seed=7,
               cost_per_sample=[2.0 ** i for i in range(5)])
    res = ml.run(target_var=1e-10, n_init=256)

    print("mean %.8f  estimator var %.2e  (target met: %s)"
          % (res["mean"], res["var"], res["target_met"]))
    print("points per level:", res["n_samples"],
          "-> %d evaluations total" % res["n_evaluations"].sum())
    print("measured QMC-vs-MC variance reduction per level:",
          np.array2string(res["mc_variance_reduction"], precision=0))


def density_from_qmc_moments():
    """Part 2: a Gaussian QoI reconstructed from QMC moment estimates."""
    from scipy import stats

    def normal_fn(z):
        return z[:, 0], np.zeros(z.shape[0])

    base_fns, dims = qmc_level_fns_from_normals([normal_fn], 1)
    mfn = Legendre(16, (-5.0, 5.0), safe_eval=False)
    fns, dims, n_moments = moments_qmc_level_fns(
        base_fns, dims, mfn, out_of_domain="clip")
    ml = MLQMC(fns, dims, n_randomizations=8, seed=11, qoi_dim=n_moments,
               chunk_size=1 << 12, cost_per_sample=[1.0])
    res = ml.run(target_var=1e-8, n_init=4096, max_rounds=14)

    moment_data = np.stack((res["mean"], np.ones(n_moments)), axis=1)
    d = sd.SimpleDistribution(mfn, moment_data, domain=mfn.domain)
    result = d.estimate_density_minimize(tol=1e-7)
    kl = sd.KL_divergence(stats.norm(0, 1).pdf, d.density, -5.0, 5.0)
    print("maxent solve success=%s  KL(exact || fitted) = %.2e"
          % (result.success, kl))


def main():
    scalar_qoi()
    density_from_qmc_moments()


if __name__ == "__main__":
    main()
