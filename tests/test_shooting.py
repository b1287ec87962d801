"""Shooting ODE simulation tests (BASELINE.json config 2).

2-level run with variance-optimal allocation; fine/coarse coupling check
(shared force field -> small level variance); NaN out-of-borders handling.
"""
import numpy as np
import pytest
import jax

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.shooting import ShootingSimulation1D, ShootingSimulation2D


CONFIG = dict(
    start_position=(0.0, 0.0),
    start_velocity=(10.0, 0.0),
    area_borders=(-100.0, 200.0, -300.0, 400.0),
    max_time=10.0,
    complexity=10.0,
    n_modes=128,
    fields_params=dict(model="gauss", corr_length=1.0, sigma=1.0, log=False),
)


def _run_mlmc(sim_cls, n0=300, n1=80):
    sim = sim_cls(dict(CONFIG))
    storage = Memory()
    pool = DeviceBatchPool(seed=9)
    step_range = [[0.1], [0.02]]
    sampler = Sampler(storage, pool, sim, step_range)
    sampler.set_initial_n_samples([n0, n1])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    return sim, storage, sampler


def test_shooting_1d_coupling():
    """Fine-coarse variance << fine variance (shared-field coupling)."""
    sim, storage, sampler = _run_mlmc(ShootingSimulation1D)
    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    value_q = quantity["target"][10]["0"][0]

    samples_l1 = np.asarray(value_q.samples(
        next(storage.chunks(level_id=1))))  # [1, N, 2]
    fine, coarse = samples_l1[0, :, 0], samples_l1[0, :, 1]
    valid = ~np.isnan(fine) & ~np.isnan(coarse)
    assert valid.sum() > 50
    v_diff = np.var(fine[valid] - coarse[valid])
    v_fine = np.var(fine[valid])
    assert v_diff < 0.5 * v_fine, (v_diff, v_fine)


def test_shooting_1d_allocation_and_bootstrap():
    sim, storage, sampler = _run_mlmc(ShootingSimulation1D)
    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    value_q = quantity["target"][10]["0"][0]
    domain = est_mod.Estimate.estimate_domain(value_q, storage, quantile=0.01)
    mfn = Legendre(5, domain)
    est = est_mod.Estimate(value_q, storage, mfn)

    # variance-optimal allocation from measured costs
    variances, n_ops = est.estimate_diff_vars_regression(
        sampler._n_scheduled_samples)
    n_estimated = est_mod.estimate_n_samples_for_target_variance(
        1e-3, variances, n_ops, n_levels=2)
    assert n_estimated.shape == (2,)
    assert np.all(n_estimated >= 2)
    # coarser level needs more samples than fine under any sane allocation
    assert n_estimated[0] >= n_estimated[1]

    # bootstrap CIs
    est.est_bootstrap(n_subsamples=30, sample_vector=[150, 40])
    assert est.mean_bs_mean.shape[-1] == 5
    assert np.all(est.var_bs_mean >= 0)
    # moment-0 is deterministic 1.0 -> zero bootstrap variance
    assert np.allclose(est.var_bs_mean[0], 0.0)


def test_shooting_2d_result_shape():
    sim, storage, sampler = _run_mlmc(ShootingSimulation2D, n0=100, n1=30)
    pairs = storage.sample_pairs()
    assert pairs[0].shape[0] == 2  # (x, y) QoI
    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    xy = quantity["target"][10]["0"]
    x_mean = np.asarray(np.nanmean(
        np.asarray(xy.samples(next(storage.chunks(level_id=0))))[0, :, 0]))
    # vx=10, T=10 -> x drifts to ~100 (force perturbs it)
    assert 50 < x_mean < 150


def test_shooting_nan_out_of_borders():
    """Tight borders: most samples leave the area -> NaN stored, masked."""
    cfg = dict(CONFIG)
    cfg["area_borders"] = (-1.0, 5.0, -1.0, 1.0)
    sim = ShootingSimulation1D(cfg)
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=1), sim, [[0.1], [0.02]])
    sampler.set_initial_n_samples([100, 20])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    # NaN results are stored as successful (reference semantics)
    assert storage.get_n_collected()[0] == 100
    pairs = storage.sample_pairs()
    assert np.isnan(pairs[0]).any()


def test_linear_path_matches_generic():
    """log=False trajectories via the fused phase->trajectory matmul must
    equal the generic force-array path (same closed form, reassociated)."""
    import jax.numpy as jnp
    from mlmc_tpu.sim.shooting import ShootingSimulation1D, ShootingSimulation2D

    for sim_cls in (ShootingSimulation1D, ShootingSimulation2D):
        sim = sim_cls(dict(CONFIG))
        cfg = sim.level_instance([0.1], [0.5]).config_dict
        keys = jax.random.split(jax.random.key(12), 16)
        n = cfg["fine"]["n_elements"]
        times = jnp.linspace(0.0, cfg["max_time"], n)
        fused = sim_cls._calculate_level(cfg, keys, "fine")
        forces = sim_cls._force_field_batch(cfg, keys, times)
        generic = sim_cls._extract_result(
            sim_cls._trajectory_finals(cfg, forces, n))
        f, g = np.asarray(fused), np.asarray(generic)
        assert np.array_equal(np.isnan(f), np.isnan(g))
        m = ~np.isnan(f)
        assert np.allclose(f[m], g[m], rtol=1e-9), (f, g)


def test_estimate_domain_all_nan_raises():
    """Borders so tight every trajectory exits: estimate_domain must raise
    instead of silently returning an infinite domain; with one live level
    it uses only that level's finite values."""
    cfg = dict(CONFIG)
    cfg["area_borders"] = (-1e-9, 1e-9, -1e-9, 1e-9)
    sim = ShootingSimulation1D(cfg)
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=2), sim, [[0.1], [0.02]])
    sampler.set_initial_n_samples([32, 8])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu import estimator as est_mod
    q = make_root_quantity(storage, q_specs=sim.result_format())
    vq = q["target"][10]["0"][0]
    with pytest.raises(ValueError, match="no finite sample"):
        est_mod.Estimate.estimate_domain(vq, storage, quantile=0.01)
