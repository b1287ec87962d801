"""3-D Darcy diffusion (sim/diffusion3d.py) — the reference's flagship
PDE workflow extended to 3-D, device-native.

Validation: exact homogeneous limit (linear pressure => flux = k0),
spectral-preconditioner exactness for constant fields, level-coupling
variance collapse, the Matheron 3-D effective-conductivity band, and
Sampler integration.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.diffusion3d import DiffusionSimulation3D as D3


def _cfg(sigma, fine, coarse, **kw):
    sim = D3(dict(sigma=sigma, **kw))
    return sim.level_instance([1.0 / fine],
                              [1.0 / coarse if coarse else 0])


def test_homogeneous_flux_exact():
    """K = k0 gives linear pressure and flux exactly k0 (also checks
    the preconditioner is the exact inverse there: CG converges in a
    couple of iterations within the f64 tolerance)."""
    cfg = _cfg(0.0, 8, 0).config_dict
    f, c = D3.calculate(cfg, 7)
    assert abs(float(f[0]) - 1.0) < 1e-8, f
    assert float(c[0]) == 0.0


def test_residual_and_symmetry():
    """The CG solution satisfies the 7-point system to cg_tol, and the
    stencil operator is symmetric (SPD — required for CG and for the
    V-cycle-free spectral preconditioning)."""
    cfg = _cfg(1.0, 8, 0).config_dict
    K = D3._conductivity(cfg, jax.random.key(1), 8)
    p = D3._solve_pressure(cfg, K)
    Kx, Ky, Kz = D3._face_conductivities(K)
    Kin, Kout = 2.0 * K[0], 2.0 * K[-1]
    b = jnp.zeros((8, 8, 8)).at[0].add(Kin)
    r = np.asarray(D3._stencil_matvec(p, Kx, Ky, Kz, Kin, Kout) - b)
    assert np.linalg.norm(r) < 1e-5 * np.linalg.norm(np.asarray(b))
    u = jax.random.normal(jax.random.key(2), (8, 8, 8))
    v = jax.random.normal(jax.random.key(3), (8, 8, 8))
    Au = D3._stencil_matvec(u, Kx, Ky, Kz, Kin, Kout)
    Av = D3._stencil_matvec(v, Kx, Ky, Kz, Kin, Kout)
    assert abs(float(jnp.vdot(v, Au) - jnp.vdot(u, Av))) < 1e-9


def test_coupling_variance_collapse():
    """Fine/coarse share the field realization: the correction variance
    must sit orders below the single-level variance, and the coarse
    marginal must match an independent coarse-only run (telescoping
    consistency, 6 sigma)."""
    cfg = _cfg(1.0, 16, 8, corr_length=0.3).config_dict
    keys = jax.random.split(jax.random.key(5), 64)
    fine, coarse, failed = jax.jit(
        lambda k: D3.calculate_batch(cfg, k))(keys)
    assert not bool(np.asarray(failed).any())
    fine = np.asarray(fine).ravel()
    coarse = np.asarray(coarse).ravel()
    d = fine - coarse
    assert d.var() < 2e-3 * fine.var(), (d.var(), fine.var())

    cfg0 = _cfg(1.0, 8, 0, corr_length=0.3).config_dict
    keys2 = jax.random.split(jax.random.key(6), 64)
    solo, _, _ = jax.jit(lambda k: D3.calculate_batch(cfg0, k))(keys2)
    solo = np.asarray(solo).ravel()
    sig = np.sqrt(coarse.var() / 64 + solo.var() / 64)
    assert abs(coarse.mean() - solo.mean()) < 6 * sig


def test_effective_conductivity_band():
    """Ensemble flux ~ Matheron's 3-D K_eff = K_g exp(sigma^2/6),
    bracketed by the harmonic/arithmetic Wiener bounds."""
    cfg = _cfg(1.0, 16, 0, corr_length=0.3).config_dict
    keys = jax.random.split(jax.random.key(8), 96)
    fine, _, _ = jax.jit(lambda k: D3.calculate_batch(cfg, k))(keys)
    m = float(np.asarray(fine).mean())
    assert np.exp(-0.5) < m < np.exp(0.5), m          # Wiener bounds
    assert abs(m - np.exp(1.0 / 6.0)) < 0.12, m       # Matheron +- fs


def test_sampler_integration():
    """Two-level run through the standard Sampler/estimation stack."""
    import mlmc_tpu.quantity.quantity_estimate as qe
    from mlmc_tpu import DeviceBatchPool, Memory, Sampler
    from mlmc_tpu.quantity.quantity import make_root_quantity

    sim = D3(dict(sigma=0.5, corr_length=0.4))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=4), sim,
                      [[1 / 4], [1 / 8]])
    sampler.set_initial_n_samples([64, 32])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    root = make_root_quantity(storage, sim.result_format())
    mean = qe.estimate_mean(root["flux"])
    m = float(np.asarray(mean.mean).ravel()[0])
    assert 0.7 < m < 1.6, m


def test_darcy3d_qmc():
    """The generic RFF-phase QMC adapter covers the 3-D sim unchanged:
    scrambled-Sobol' phases drive the cube's flux estimate, agreeing
    with the key-driven MC path and reducing the dominant level-0
    variance by an order of magnitude."""
    from mlmc_tpu.qmc import MLQMC, darcy_qmc_level_fns

    sim = D3(dict(sigma=0.8, corr_length=0.4, n_modes=32))
    level_params = [[1 / 4], [1 / 8]]
    fns, dims = darcy_qmc_level_fns(sim, level_params)
    assert dims == [32, 32]
    ml = MLQMC(fns, dims, n_randomizations=8, seed=9, chunk_size=1 << 7)
    est = ml.run(target_var=1e-4, n_init=1 << 7, max_rounds=4)
    assert np.isfinite(est["mean"]) and est["mean"] > 0
    gains = est["mc_variance_reduction"]
    assert gains[0] > 5.0, gains

    # 6-sigma agreement with the key-driven MC batch path
    mc_mean, mc_var = 0.0, 0.0
    for lev, params in enumerate(level_params):
        coarse = [0] if lev == 0 else level_params[lev - 1]
        cfg = sim.level_instance(params, coarse).config_dict
        keys = jax.random.split(jax.random.fold_in(jax.random.key(31),
                                                   lev), 384)
        fine, coarse_r, _ = D3.calculate_batch(cfg, keys)
        d = np.asarray(fine[:, 0] - coarse_r[:, 0])
        mc_mean += d.mean()
        mc_var += d.var(ddof=1) / 384
    tol = 6 * np.sqrt(mc_var + float(est["var"]))
    assert abs(float(est["mean"]) - mc_mean) < tol


# ----------------------------------------------------------------------- #
# 3-D multigrid + fractured media
# ----------------------------------------------------------------------- #
def test_galerkin_coarsening_exact_3d():
    """P^T A P identity: the coarse 7-point operator built from summed
    interface transmissibilities must equal restrict(A_fine(prolong))
    to machine precision."""
    key = jax.random.key(0)
    cfg = dict(sigma=1.0,
               _wave_vectors=jax.random.normal(key, (16, 3)))
    K = D3._conductivity(cfg, key, 8)
    Kx, Ky, Kz = D3._face_conductivities(K)
    Kin, Kout = 2.0 * K[0], 2.0 * K[-1]
    Kxc, Kyc, Kzc, Kic, Koc = D3._galerkin_coarsen(Kx, Ky, Kz, Kin,
                                                   Kout)
    v = jax.random.normal(jax.random.key(1), (4, 4, 4))
    vp = jnp.repeat(jnp.repeat(jnp.repeat(v, 2, 0), 2, 1), 2, 2)
    lhs = D3._stencil_matvec(vp, Kx, Ky, Kz, Kin, Kout).reshape(
        4, 2, 4, 2, 4, 2).sum((1, 3, 5))
    rhs = D3._stencil_matvec(v, Kxc, Kyc, Kzc, Kic, Koc)
    assert float(jnp.max(jnp.abs(lhs - rhs))) < 1e-12


def test_mg_preconditioner_homogeneous_and_residual():
    """MG-CG solves the homogeneous problem exactly and a rough-field
    system to the CG tolerance."""
    wv = jax.random.normal(jax.random.key(2), (16, 3))
    cfg = dict(sigma=0.0, precond="mg", fine_n=8, coarse_n=0,
               _wave_vectors=wv)
    f, _ = D3.calculate(cfg, 3)
    assert abs(float(f[0]) - 1.0) < 1e-6
    cfg = dict(sigma=1.5, precond="mg", fine_n=8, coarse_n=0,
               _wave_vectors=wv)
    K = D3._conductivity(cfg, jax.random.key(4), 8)
    p = D3._solve_pressure(cfg, K)
    Kx, Ky, Kz = D3._face_conductivities(K)
    Kin, Kout = 2.0 * K[0], 2.0 * K[-1]
    b = jnp.zeros((8, 8, 8)).at[0].add(Kin)
    r = np.asarray(D3._stencil_matvec(p, Kx, Ky, Kz, Kin, Kout) - b)
    assert np.linalg.norm(r) < 1e-4 * np.linalg.norm(np.asarray(b))


def test_fracture_indicator_3d_geometry():
    """A single centered disc with normal z flags exactly the cells on
    the midplane inside the radius."""
    from mlmc_tpu.random.frac_geom import fracture_indicator_3d

    n = 8
    discs = (jnp.array([[0.5, 0.5, 0.5]]),
             jnp.array([[0.0, 0.0, 1.0]]), jnp.array([0.3]))
    ind = np.asarray(fracture_indicator_3d(discs, n))
    # the disc plane z=0.5 lies between cell layers 3 and 4 (centers
    # at (k+0.5)/8): NO center is within h/2=0.0625 of 0.5 exactly...
    # centers 0.4375 and 0.5625 are exactly at the threshold => both
    # layers flag inside the radius; everything else stays clear
    on = ind.sum(axis=(0, 1))
    assert on[3] > 0 and on[4] > 0
    assert on[[0, 1, 2, 5, 6, 7]].sum() == 0
    # in-plane: corners (far from center) unflagged
    assert ind[0, 0, 3] == 0 and ind[0, 0, 4] == 0
    center = ind[3:5, 3:5, 3:5]
    assert center.sum() > 0


def test_fractured_diffusion_3d_end_to_end():
    """Coupled fractured batches run under MG-CG with contrast 1e3:
    fluxes finite and above the bulk (fractures conduct), fine/coarse
    still coupled through the shared geometry + field."""
    from mlmc_tpu.random.frac_geom import FracturedDiffusionSimulation3D

    sim = FracturedDiffusionSimulation3D(
        dict(sigma=0.5, corr_length=0.4, n_fractures=12,
             frac_contrast=1e3))
    cfg = sim.level_instance([1 / 16], [1 / 8]).config_dict
    keys = jax.random.split(jax.random.key(5), 8)
    fine, coarse, failed = jax.jit(
        lambda k: FracturedDiffusionSimulation3D.calculate_batch(
            cfg, k))(keys)
    fine = np.asarray(fine).ravel()
    coarse = np.asarray(coarse).ravel()
    assert not np.asarray(failed).any()
    assert np.all(np.isfinite(fine)) and np.all(fine > 0.5)
    assert (fine - coarse).var() < fine.var()
    # geometry randomness forbids the QMC phase path, loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="QMC"):
        FracturedDiffusionSimulation3D._conductivity(
            cfg, jax.random.key(0), 8, phases=jnp.zeros(16))
