"""Benchmark: moment+covariance estimation throughput (samples/s/chip).

Workload = BASELINE.json config 1: 5-level SynthSimulation, 25 Legendre
moments, full mean/variance/covariance estimate over 10^8 telescoped samples,
via the fused on-device pipeline (mlmc_tpu.ops.fused_estimate) — samples are
generated, pushed through the Legendre Vandermonde, and reduced without ever
touching HBM as a stored batch. Afterwards a maxent PDF is reconstructed from
the estimated covariance (config 3 flavor) and its solve time reported.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}

vs_baseline compares against the reference numpy pipeline measured on one
CPU host (see BASELINE.md "measured" section): the same per-sample work
(sample gen + legvander(25) + diff + sum/sum2 + outer-product accumulation)
in vectorized numpy.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.moments import Legendre
from mlmc_tpu.random.distributions import Norm
from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.ops.fused_estimate import fused_mlmc_moments, accumulators_to_estimates

# Baseline: best-case single-host numpy doing the same math (gen +
# legvander(25) + diff sums + phi^T phi accumulation), measured on this
# machine — 6.98e5 samples/s. The reference's ACTUAL code path (lazy
# Quantity DAG, estimate_mean + covariance, reference
# mlmc/quantity/quantity_estimate.py:43-65) measures 2.35e3 samples/s;
# we compare against the far stronger idealized kernel. See BASELINE.md.
BASELINE_SAMPLES_PER_S = 6.98e5

N_MOMENTS = 25
LEVEL_STEPS = [0.5, 0.25, 0.125, 0.0625, 0.03125]
# 10^8 samples, MLMC-style geometric decay across 5 levels
N_PER_LEVEL = [64_000_000, 24_000_000, 8_000_000, 3_000_000, 1_000_000]
CHUNK = 1 << 19  # 512k samples per fori_loop step


def build_step():
    distr = Norm()
    moments_fn = Legendre(N_MOMENTS, (-4.0, 4.0))
    fns = []
    for lvl, h in enumerate(LEVEL_STEPS):
        coarse = 0.0 if lvl == 0 else LEVEL_STEPS[lvl - 1]
        fns.append(SynthSimulation.scalar_batch_fn(h, coarse, distr))

    def step(root_key):
        return fused_mlmc_moments(
            fns, moments_fn, root_key, N_PER_LEVEL, chunk_size=CHUNK,
            acc_dtype=jnp.float32)

    return jax.jit(step), moments_fn


def main():
    step, moments_fn = build_step()
    key = jax.random.key(2024)

    # compile warm-up
    accs = step(key)
    jax.block_until_ready(accs)

    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        accs = step(jax.random.fold_in(key, i))
        jax.block_until_ready(accs)
    elapsed = (time.perf_counter() - t0) / n_runs

    total = float(sum(N_PER_LEVEL))
    throughput = total / elapsed

    est = accumulators_to_estimates(jax.tree.map(np.asarray, accs))

    # maxent PDF reconstruction from the estimated moments (config 3 flavor)
    import mlmc_tpu.tool.simple_distribution as sd

    t1 = time.perf_counter()
    with jax.enable_x64(True):
        orto, info = sd.construct_ortogonal_moments(
            moments_fn, est["cov"], tol=1e-7)
        # means in the orthogonal basis: mu_orto = L @ mu
        L = info[2]
        mu = L @ est["mean"]
        moments_data = np.stack((mu, np.ones(orto.size)), axis=1)
        d = sd.SimpleDistribution(orto, moments_data, domain=moments_fn.domain)
        result = d.estimate_density_minimize(tol=1e-9)
    maxent_s = time.perf_counter() - t1

    out = {
        "metric": "fused 5-level moment+cov estimate, 25 Legendre moments, 1e8 samples",
        "value": round(throughput, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(throughput / BASELINE_SAMPLES_PER_S, 2),
        "extras": {
            "wall_s": round(elapsed, 4),
            "maxent_solve_s": round(maxent_s, 3),
            "maxent_converged": bool(result.success),
            "mean_p1": float(est["mean"][1]),
            "n_valid": est["n_samples"].tolist(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
