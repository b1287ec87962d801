"""Transport (02_conc) simulation tests.

Mass conservation of the flux-form upwind scheme, constant-K breakthrough
timing, fine/coarse coupling, CFL-budget failure semantics, and the full
MLMC loop over the time-series QoI (reference workflow:
test/02_conc/proc_conc.py + 02_conc_tmpl.yaml).
"""
import numpy as np
import jax

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.transport import TransportSimulation


def _single_level_cfg(sim, n=32):
    return sim.level_instance([1.0 / n], [0]).config_dict


def test_mass_conservation_constant_k():
    """All source mass exits through the right edge: the time integral of
    the breakthrough curve equals the initial mass (flux-form update
    conserves mass to roundoff; the integral check also covers the
    interpolated series)."""
    obs = tuple(np.linspace(1e-3, 0.6, 96))
    sim = TransportSimulation(dict(sigma=0.0, corr_length=0.2,
                                   obs_times=obs, steps_per_cell=16))
    cfg = _single_level_cfg(sim, n=32)
    fine, _ = TransportSimulation.calculate(cfg, seed=1)
    series = np.asarray(fine)[:len(obs)]   # flux spec precedes conc spec
    assert np.all(np.isfinite(np.asarray(fine)))
    assert np.all(series > -1e-8)
    # rate ~ 0 before the front arrives and after it has passed
    assert series[0] < 1e-6
    assert series[-1] < 1e-3 * series.max()
    mass_out = np.trapezoid(series, obs)
    box = TransportSimulation.SOURCE_BOX
    mass0 = sim._config.get("porosity", TransportSimulation.PHI) * (
        (box[1] - box[0]) * (box[3] - box[2]))
    assert abs(mass_out - mass0) < 0.05 * mass0, (mass_out, mass0)


def test_breakthrough_timing_constant_k():
    """K=1, phi=0.1 -> pore velocity u = 10; the source block centred at
    x=0.25 reaches the outlet around t = 0.75/u = 0.075."""
    obs = tuple(np.linspace(5e-3, 0.3, 60))
    sim = TransportSimulation(dict(sigma=0.0, corr_length=0.2,
                                   obs_times=obs, steps_per_cell=16))
    cfg = _single_level_cfg(sim, n=64)
    fine, _ = TransportSimulation.calculate(cfg, seed=1)
    series = np.asarray(fine)[:len(obs)]
    t_peak = obs[int(np.argmax(series))]
    assert 0.03 < t_peak < 0.15, t_peak


def test_fine_coarse_coupling():
    obs = tuple(np.linspace(0.05, 0.3, 6))
    sim = TransportSimulation(dict(sigma=0.5, corr_length=0.3,
                                   field_method="circulant",
                                   obs_times=obs, steps_per_cell=32))
    level_sim = sim.level_instance([1 / 32], [1 / 8])
    keys = jax.random.split(jax.random.key(3), 32)
    fine, coarse, failed = TransportSimulation.calculate_batch(
        level_sim.config_dict, keys)
    assert not np.any(np.asarray(failed))
    f = np.asarray(fine)[:, :6]    # flux part of the QoI vector
    c = np.asarray(coarse)[:, :6]
    # compare the curves where they carry signal (late-time obs points)
    j = f.mean(axis=0).argmax()
    assert np.var(f[:, j] - c[:, j]) < 0.5 * np.var(f[:, j]), (
        np.var(f[:, j] - c[:, j]), np.var(f[:, j]))


def test_observe_point_series():
    """Point-concentration time series (the reference template's
    observe_points): bounded in [0, 1], and points farther downstream
    peak later for a constant-K flow."""
    obs = tuple(np.linspace(5e-3, 0.25, 50))
    pts = ((0.5, 0.5), (0.7, 0.5), (0.9, 0.5))
    sim = TransportSimulation(dict(sigma=0.0, corr_length=0.2,
                                   obs_times=obs, steps_per_cell=16,
                                   observe_points=pts))
    cfg = _single_level_cfg(sim, n=64)
    fine, _ = TransportSimulation.calculate(cfg, seed=1)
    T, P = len(obs), len(pts)
    conc = np.asarray(fine)[T:].reshape(T, P)
    assert np.all(conc > -1e-5) and np.all(conc < 1.0 + 1e-5)
    peaks = [obs[int(np.argmax(conc[:, p]))] for p in range(P)]
    assert peaks[0] < peaks[1] < peaks[2], peaks
    assert conc.max() > 0.05   # the plume actually passes the points


def test_muscl_scheme_sharper_and_conservative():
    """The minmod-MUSCL + SSP-RK2 option stays conservative and bounded,
    and resolves a sharper front than donor-cell upwind (higher
    breakthrough peak at the same grid)."""
    obs = tuple(np.linspace(1e-3, 0.6, 96))
    peaks, masses = {}, {}
    for scheme in ("upwind", "muscl"):
        sim = TransportSimulation(dict(sigma=0.0, corr_length=0.2,
                                       obs_times=obs, steps_per_cell=32,
                                       scheme=scheme, observe_points=()))
        cfg = _single_level_cfg(sim, n=32)
        fine, _ = TransportSimulation.calculate(cfg, seed=1)
        series = np.asarray(fine)
        assert np.all(np.isfinite(series))
        assert np.all(series > -1e-6)
        peaks[scheme] = series.max()
        masses[scheme] = np.trapezoid(series, obs)
    box = TransportSimulation.SOURCE_BOX
    mass0 = TransportSimulation.PHI * (
        (box[1] - box[0]) * (box[3] - box[2]))
    for scheme, m in masses.items():
        assert abs(m - mass0) < 0.05 * mass0, (scheme, m, mass0)
    assert peaks["muscl"] > 1.15 * peaks["upwind"], peaks


def test_cfl_budget_failure():
    """A step budget too small to cover the horizon at the stable dt must
    FAIL the sample (NaN results + failed flag), not integrate a shorter
    time range."""
    sim = TransportSimulation(dict(sigma=0.0, corr_length=0.2,
                                   obs_times=(5.0,), steps_per_cell=1))
    cfg = _single_level_cfg(sim, n=16)
    keys = jax.random.split(jax.random.key(0), 4)
    fine, _, failed = TransportSimulation.calculate_batch(cfg, keys)
    assert np.all(np.asarray(failed))
    assert np.all(np.isnan(np.asarray(fine)))


def test_transport_mlmc_loop():
    """Full sampler loop + estimation over the time-series QoI, including
    DAG time interpolation between observation points."""
    obs = tuple(np.linspace(0.05, 0.3, 6))
    sim = TransportSimulation(dict(sigma=0.5, corr_length=0.3,
                                   field_method="circulant",
                                   obs_times=obs, steps_per_cell=32))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=5, min_bucket=16), sim,
                      [[1 / 4], [1 / 16]])
    sampler.set_initial_n_samples([32, 8])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    times = sim.result_format()[0].times
    t_mid = 0.5 * (times[2] + times[3])  # strictly between observation points
    vq = quantity["conc_flux"].time_interpolation(t_mid)["outflow"][0]
    domain = est_mod.Estimate.estimate_domain(vq, storage, quantile=0.01)
    mfn = Legendre(4, domain)
    est = est_mod.Estimate(vq, storage, mfn)
    means, variances = est.estimate_moments(mfn)
    assert means[0] == 1 and variances[0] == 0
    assert np.all(np.isfinite(np.asarray(means)))
    n_ops = storage.get_n_ops()
    assert len(n_ops) == 2 and all(c > 0 for c in n_ops)
