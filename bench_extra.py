"""Secondary benchmarks: BASELINE configs 2 (shooting), 3 (35-moment
two-Gaussian maxent), 4 (Quantity-algebra workload) and 5 (diffusion).
Not part of the driver's bench contract (bench.py stays the single-line
headline); run manually, numbers recorded in BASELINE.md.

Usage: python bench_extra.py [config ...]
"""
import json
import sys
import time

import numpy as np
import jax

from mlmc_tpu.sim.shooting import ShootingSimulation1D
from mlmc_tpu.sim.diffusion import DiffusionSimulation


def _timed_batches(batch_fn, B, reps):
    """Sustained throughput: ``reps`` coupled batches fused into ONE jitted
    dispatch (each device call over the remote tunnel costs ~30 ms of
    round-trip latency regardless of work — see BASELINE.md notes)."""
    import jax.numpy as jnp

    @jax.jit
    def run(seed):
        acc = None
        for r in range(reps):
            keys = jax.random.split(jax.random.fold_in(seed, r), B)
            fine, coarse, _ = batch_fn(keys)
            s = jnp.sum(fine) + jnp.sum(coarse)
            acc = s if acc is None else acc + s
        return acc

    seed = jax.random.key(0)
    _ = float(run(seed))
    t0 = time.perf_counter()
    for i in range(3):
        _ = float(run(jax.random.key(i + 1)))
    return (time.perf_counter() - t0) / 3 / reps


def bench_shooting():
    sim = ShootingSimulation1D(dict(
        start_position=(0.0, 0.0), start_velocity=(10.0, 0.0),
        area_borders=(-100.0, 200.0, -300.0, 400.0), max_time=10.0,
        complexity=20.0, n_modes=256,
        fields_params=dict(model="gauss", corr_length=1.0, sigma=0.5,
                           log=False)))
    level_sim = sim.level_instance([0.02], [0.1])  # fine n=1000 steps
    cfg = level_sim.config_dict
    B = 8192
    dt = _timed_batches(
        lambda k: ShootingSimulation1D.calculate_batch(cfg, k), B, reps=8)
    return dict(workload="shooting 1D, 1000+200 Euler steps, 256 modes",
                samples_per_s=round(B / dt, 1), wall_s=round(dt, 4))


def bench_diffusion():
    # BASELINE config 5 names the circulant-embedding GRF explicitly
    sim = DiffusionSimulation(dict(sigma=1.0, corr_length=0.3,
                                   field_method="circulant"))
    level_sim = sim.level_instance([1 / 64], [1 / 16])
    cfg = level_sim.config_dict
    B = 256
    dt = _timed_batches(
        lambda k: DiffusionSimulation.calculate_batch(cfg, k), B, reps=4)
    return dict(workload="Darcy 64^2+16^2 grids, CG solve, "
                         "circulant-embedding GRF",
                samples_per_s=round(B / dt, 1), wall_s=round(dt, 4))


def bench_maxent35():
    """BASELINE config 3: maxent PDF from 35 moments of a two-Gaussian
    mixture (reference harness: test/test_distribution.py:262-354 pattern —
    semiexact moments + covariance, orthogonalize, solve, KL vs exact)."""
    import scipy.stats as stats
    import mlmc_tpu.tool.simple_distribution as sd
    from mlmc_tpu.moments import Legendre

    w = (0.5, 0.5)
    comps = (stats.norm(-1.5, 0.6), stats.norm(2.0, 1.0))

    def pdf(x):
        return sum(wi * c.pdf(x) for wi, c in zip(w, comps))

    # quantile-cut domain like the reference CutDistribution (:36-88)
    lo = min(c.ppf(1e-8) for c in comps)
    hi = max(c.ppf(1 - 1e-8) for c in comps)
    R = 35
    mfn = Legendre(R, (lo, hi))

    cov = sd.compute_semiexact_cov(mfn, pdf)
    orto, info = sd.construct_ortogonal_moments(mfn, cov, tol=1e-13)
    mu = sd.compute_semiexact_moments(orto, pdf)
    moments_data = np.stack((mu, np.ones(orto.size)), axis=1)

    t0 = time.perf_counter()
    d = sd.SimpleDistribution(orto, moments_data, domain=mfn.domain)
    result = d.estimate_density_minimize(tol=1e-10)
    solve_s = time.perf_counter() - t0

    kl = sd.KL_divergence(pdf, d.density, lo, hi)
    fitted = sd.compute_semiexact_moments(orto, d.density)
    residual = float(np.linalg.norm(fitted - mu))
    return dict(workload="maxent 35 moments, two-Gaussian mixture, tol 1e-10",
                solve_s=round(solve_s, 4),
                kl_vs_exact=float(kl),
                moment_residual=residual,
                n_orto_moments=int(orto.size),
                converged=bool(getattr(result, "success", True)))


def bench_quantity_algebra():
    """BASELINE config 4: Quantity-algebra workload — a composite DAG
    (ufunc + arithmetic + getitem + select + moments) evaluated by
    estimate_mean over stored samples; reference library timed on the
    same DAG and data at reduced size for the per-sample comparison."""
    import mlmc_tpu.quantity.quantity_estimate as qe
    from mlmc_tpu import (Memory, SynthSimulation, DeviceBatchPool, Sampler,
                          Legendre, make_root_quantity)

    def run_tpu(n0):
        from mlmc_tpu import DeviceMemory

        sim = SynthSimulation(dict(distr="norm", complexity=2))
        # HBM-resident storage + device-resident pool results: the sample
        # payload never crosses the host<->device link
        storage = DeviceMemory()
        sampler = Sampler(storage,
                          DeviceBatchPool(seed=3, device_results=True), sim,
                          [[0.1], [0.01], [0.001]])
        sampler.set_initial_n_samples([n0, n0 // 4, n0 // 16])
        sampler.schedule_samples()
        sampler.ask_sampling_pool_for_samples()
        total = sum(storage.get_n_collected())

        root = make_root_quantity(storage, sim.result_format())
        length, width = root["length"], root["width"]
        expr = np.sin(length[1]["10"]) * 2.0 + width[2]["30"] / 3.0
        # mask = traceable selection: the whole DAG fuses into one jitted
        # program per chunk (select would force eager per-node evaluation)
        sel = expr.mask(expr < 10.0)
        mq = qe.moments(sel, Legendre(8, (-10, 10)))
        # one warm pass (trace+compile), then timed passes
        qe.estimate_mean(mq)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            qe.cache_clear()
            m = qe.estimate_mean(mq)
        dt = (time.perf_counter() - t0) / reps
        return total, dt, np.asarray(m.mean)

    total, dt, mean = run_tpu(1 << 21)
    out = dict(workload="quantity DAG: sin/mul/add/div/getitem/mask + "
                        "8 Legendre moments, 3 levels",
               n_samples=int(total),
               samples_per_s=round(total / dt, 1),
               wall_s=round(dt, 4),
               mean0=float(mean.ravel()[0]))

    # reference on the same DAG, smaller N (pure-numpy host path)
    try:
        sys.path.insert(0, "tests")
        from reference_shim import import_reference
        mlmc_ref = import_reference()
        import mlmc.quantity.quantity_estimate as ref_qe
        from mlmc.quantity.quantity import make_root_quantity as ref_root_fn
        from mlmc.moments import Legendre as RefLegendre
        from mlmc.sample_storage import Memory as RefMemory

        # fill with our DeviceBatchPool results at reduced size
        sim = SynthSimulation(dict(distr="norm", complexity=2))
        storage = Memory()
        sampler = Sampler(storage, DeviceBatchPool(seed=3), sim,
                          [[0.1], [0.01], [0.001]])
        n0 = 1 << 14
        sampler.set_initial_n_samples([n0, n0 // 4, n0 // 16])
        sampler.schedule_samples()
        sampler.ask_sampling_pool_for_samples()
        ref_storage = RefMemory()
        ref_storage.save_global_data(result_format=[
            __import__("mlmc.quantity.quantity_spec", fromlist=["QuantitySpec"])
            .QuantitySpec(name=s.name, unit=s.unit, shape=s.shape,
                          times=s.times, locations=s.locations)
            for s in sim.result_format()],
            level_parameters=[[0.1], [0.01], [0.001]])
        for lvl, pairs in enumerate(storage.sample_pairs()):
            arr = np.asarray(pairs)  # [M, N, 2 or 1]
            n = arr.shape[1]
            rows = np.empty((n, 2), dtype=object)
            for i in range(n):
                fine = arr[:, i, 0]
                coarse = arr[:, i, 1] if arr.shape[2] > 1 else np.zeros_like(fine)
                rows[i, 0] = "L%02d_S%07d" % (lvl, i)
                rows[i, 1] = (fine, coarse)
            ref_storage.save_samples({lvl: rows}, {})
        total_ref = sum(storage.get_n_collected())

        root = ref_root_fn(ref_storage, ref_storage.load_result_format())
        expr = np.sin(root["length"][1]["10"]) * 2.0 + root["width"][2]["30"] / 3.0
        sel = expr.select(expr < 10.0)
        mq = ref_qe.moments(sel, RefLegendre(8, (-10, 10)))
        t0 = time.perf_counter()
        m_ref = ref_qe.estimate_mean(mq)
        dt_ref = time.perf_counter() - t0
        out["reference_samples_per_s"] = round(total_ref / dt_ref, 1)
        out["reference_n_samples"] = int(total_ref)
        out["speedup_vs_reference"] = round(
            out["samples_per_s"] / out["reference_samples_per_s"], 1)
    except Exception as e:
        out["reference_error"] = str(e)[:200]
    return out


def bench_e2e_adaptive():
    """End-to-end production path on one chip: adaptive target-variance
    loop (DeviceBatchPool + HBM-resident DeviceMemory) followed by the
    fast-tier maxent density from the stored samples."""
    import mlmc_tpu.estimator as est_mod
    from mlmc_tpu import (DeviceMemory, SynthSimulation, DeviceBatchPool,
                          Sampler, Legendre, make_root_quantity)

    t0 = time.perf_counter()
    sim = SynthSimulation(dict(distr="norm", complexity=2))
    storage = DeviceMemory()
    # min_bucket = max_batch: every executable is the 65536 bucket — with
    # DYNAMIC_CONFIG executable sharing that is ~2 remote compiles total
    # (level 0 + shared) instead of one per (level, bucket)
    sampler = Sampler(storage, DeviceBatchPool(seed=17, device_results=True,
                                               min_bucket=65536),
                      sim, [[0.5], [0.25], [0.125], [0.0625], [0.03125]])
    sampler.set_initial_n_samples([200_000, 2_000])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, sim.result_format())
    q = root["length"][1]["10"][0, 0]
    mfn = Legendre(25, (-4.0, 4.0))
    est = est_mod.Estimate(q, storage, mfn)

    target_var = 2e-8
    rounds = 0
    while rounds < 20:
        variances, n_ops = est.estimate_diff_vars_regression(
            sampler._n_scheduled_samples)
        n_est = est_mod.estimate_n_samples_for_target_variance(
            target_var, variances, n_ops, n_levels=sampler.n_levels)
        if sampler.process_adding_samples(n_est, 0, 0.3):
            break
        rounds += 1
    _d, _i, result, _o = est.construct_density_fast(tol=1e-8)
    wall = time.perf_counter() - t0
    n_total = int(np.sum(storage.get_n_collected()))
    return dict(workload="adaptive loop to target_var=2e-8 + fast maxent "
                         "density (DeviceMemory, 5 levels, 25 moments)",
                wall_s=round(wall, 2), n_samples=n_total,
                adaptive_rounds=rounds,
                n_per_level=[int(v) for v in storage.get_n_collected()],
                density_converged=bool(getattr(result, "success", True)))


BENCHES = {"shooting": bench_shooting, "diffusion": bench_diffusion,
           "maxent35": bench_maxent35, "quantity": bench_quantity_algebra,
           "e2e": bench_e2e_adaptive}

if __name__ == "__main__":
    picks = sys.argv[1:] or list(BENCHES)
    results = {}
    for name in picks:
        try:
            results[name] = BENCHES[name]()
        except Exception as e:  # tunnel flakiness must not sink the rest
            results[name] = {"error": str(e)[:200]}
    print(json.dumps(results))
