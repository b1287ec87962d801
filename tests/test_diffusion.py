"""Diffusion (cond_field) simulation tests — BASELINE.json config 5.

Homogeneous-limit exactness, lognormal effective-conductivity statistics
(2-D geometric-mean law), fine/coarse coupling, full MLMC loop.
"""
import numpy as np
import jax

from mlmc_tpu import Memory, DeviceBatchPool, Sampler, Legendre
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.diffusion import DiffusionSimulation


def test_homogeneous_limit():
    """sigma=0 -> K=1 -> flux = 1 exactly (Darcy on the unit square)."""
    sim = DiffusionSimulation(dict(sigma=0.0, corr_length=0.2))
    level_sim = sim.level_instance([1 / 16], [0])
    fine, coarse = DiffusionSimulation.calculate(level_sim.config_dict, seed=7)
    assert abs(float(fine[0]) - 1.0) < 1e-6, fine


def test_effective_conductivity_statistics():
    """2-D lognormal medium: effective K ~= geometric mean = exp(0) = 1
    (classic duality result for sigma not too large)."""
    sim = DiffusionSimulation(dict(sigma=0.5, corr_length=0.3, n_modes=128))
    level_sim = sim.level_instance([1 / 32], [0])
    keys = jax.random.split(jax.random.key(0), 64)
    fine, _, _ = DiffusionSimulation.calculate_batch(level_sim.config_dict, keys)
    fluxes = np.asarray(fine)[:, 0]
    assert np.all(fluxes > 0)
    mean = fluxes.mean()
    sem = fluxes.std() / np.sqrt(len(fluxes))
    assert abs(mean - 1.0) < max(5 * sem, 0.1), (mean, sem)


def test_fine_coarse_coupling():
    """Shared field realization -> strongly correlated fine/coarse fluxes."""
    sim = DiffusionSimulation(dict(sigma=1.0, corr_length=0.3, n_modes=128))
    level_sim = sim.level_instance([1 / 32], [1 / 8])
    keys = jax.random.split(jax.random.key(3), 48)
    fine, coarse, _ = DiffusionSimulation.calculate_batch(level_sim.config_dict, keys)
    f, c = np.asarray(fine)[:, 0], np.asarray(coarse)[:, 0]
    assert np.var(f - c) < 0.3 * np.var(f), (np.var(f - c), np.var(f))


def test_diffusion_mlmc_loop():
    sim = DiffusionSimulation(dict(sigma=0.7, corr_length=0.3, n_modes=64))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=5, min_bucket=32), sim,
                      [[1 / 4], [1 / 16]])
    sampler.set_initial_n_samples([64, 16])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    vq = quantity["flux"][0]["outflow"][0]
    domain = est_mod.Estimate.estimate_domain(vq, storage, quantile=0.01)
    mfn = Legendre(4, domain)
    est = est_mod.Estimate(vq, storage, mfn)
    means, variances = est.estimate_moments(mfn)
    assert means[0] == 1 and variances[0] == 0
    # n_ops recorded per level (allocation inputs)
    n_ops = storage.get_n_ops()
    assert len(n_ops) == 2 and all(c > 0 for c in n_ops)


def test_fractured_diffusion():
    """Device fracture network: rasterization geometry + MLMC coupling +
    physical sanity (fractures raise the effective conductivity)."""
    import jax
    import jax.numpy as jnp
    from mlmc_tpu.random.frac_geom import (
        sample_fracture_network, fracture_min_distance, fracture_indicator,
        FracturedDiffusionSimulation)
    from mlmc_tpu.sim.diffusion import DiffusionSimulation

    # geometry: distance to a known horizontal segment
    seg = jnp.array([[[0.2, 0.5], [0.8, 0.5]]])
    pts = jnp.array([[0.5, 0.5], [0.5, 0.7], [0.1, 0.5], [0.9, 0.9]])
    d = np.asarray(fracture_min_distance(seg, pts))
    assert np.allclose(d, [0.0, 0.2, 0.1, np.hypot(0.1, 0.4)], atol=1e-7)

    # the indicator marks exactly the cells along the segment
    ind = np.asarray(fracture_indicator(seg, 16))
    assert ind.sum() > 0
    ys = np.nonzero(ind)[1]
    assert set(ys) <= {7, 8}  # stays on the y=0.5 row of a 16-grid

    # network sampling is replayable and respects the size range
    key = jax.random.key(3)
    net1 = sample_fracture_network(key, 32, size_range=(0.1, 0.4))
    net2 = sample_fracture_network(key, 32, size_range=(0.1, 0.4))
    assert np.allclose(np.asarray(net1), np.asarray(net2))
    lengths = np.linalg.norm(np.asarray(net1[:, 1] - net1[:, 0]), axis=1)
    assert lengths.min() >= 0.1 - 1e-6 and lengths.max() <= 0.4 + 1e-6

    # coupled MLMC batch: fine/coarse share the network; fractures with a
    # large contrast must increase the mean outflow vs the unfractured sim
    cfg = dict(sigma=0.5, corr_length=0.3, n_modes=64, n_fractures=16,
               frac_contrast=1e3)
    frac_sim = FracturedDiffusionSimulation(cfg)
    base_sim = DiffusionSimulation(dict(sigma=0.5, corr_length=0.3,
                                        n_modes=64))
    keys = jax.random.split(jax.random.key(7), 32)
    out_f = []
    for sim in (frac_sim, base_sim):
        ls = sim.level_instance([1 / 16], [1 / 8])
        fine, coarse, failed = jax.jit(
            lambda k, c=ls.config_dict, s=type(sim): s.calculate_batch(c, k)
        )(keys)
        assert not np.any(np.asarray(failed))
        assert np.all(np.isfinite(np.asarray(fine)))
        out_f.append(float(np.mean(np.asarray(fine)[:, 0])))
    assert out_f[0] > 1.5 * out_f[1], out_f  # fractures conduct


def test_circulant_field_diffusion():
    """BASELINE config 5 variant: exact circulant-embedding GRF conductivity.
    Fine/coarse of one sample share the realization (coupling), and the
    homogeneous limit sigma->0 recovers flux == 1 (unit conductivity)."""
    import jax
    import jax.numpy as jnp
    from mlmc_tpu.sim.diffusion import DiffusionSimulation

    sim = DiffusionSimulation(dict(sigma=0.8, corr_length=0.3,
                                   field_method="circulant"))
    ls = sim.level_instance([1 / 16], [1 / 8])
    cfg = ls.config_dict
    keys = jax.random.split(jax.random.key(4), 16)
    fine, coarse, failed = jax.jit(
        lambda k: DiffusionSimulation.calculate_batch(cfg, k))(keys)
    assert not np.any(np.asarray(failed))
    f, c = np.asarray(fine)[:, 0], np.asarray(coarse)[:, 0]
    assert np.all(np.isfinite(f)) and np.all(np.isfinite(c))
    # coupling: fine/coarse fluxes of one sample are strongly correlated
    corr = np.corrcoef(f, c)[0, 1]
    assert corr > 0.8, corr

    # homogeneous limit: sigma=0 -> K=1 -> flux=1 on the unit square
    sim0 = DiffusionSimulation(dict(sigma=0.0, corr_length=0.3,
                                    field_method="circulant"))
    cfg0 = sim0.level_instance([1 / 16], [0]).config_dict
    f0, _, _ = DiffusionSimulation.calculate_batch(
        cfg0, jax.random.split(jax.random.key(0), 2))
    assert np.allclose(np.asarray(f0), 1.0, atol=1e-6)

    # exactness of the generator: single-cell variance of log K ~ sigma^2
    K = DiffusionSimulation._conductivity(cfg, jax.random.key(1), 16)
    draws = jax.vmap(lambda k: DiffusionSimulation._conductivity(cfg, k, 16))(
        jax.random.split(jax.random.key(2), 256))
    logs = np.log(np.asarray(draws))
    assert abs(logs.std() - 0.8) < 0.08


def test_spectral_preconditioner():
    """The DST/DCT basis diagonalizes the constant-coefficient operator
    exactly (homogeneous solve needs ONE CG iteration), and on a rough
    lognormal field the spectrally preconditioned CG converges within an
    iteration budget where Jacobi-CG is nowhere near (the basis removes
    the O(n^2) grid factor from the condition number)."""
    import jax.numpy as jnp
    from mlmc_tpu.sim.diffusion import DiffusionSimulation as D

    # exact eigendecomposition: M is the exact inverse for constant K
    n = 12
    Sx, Cy, lam = D._spectral_basis(n)
    assert np.allclose(Sx @ Sx.T, np.eye(n), atol=1e-12)
    assert np.allclose(Cy @ Cy.T, np.eye(n), atol=1e-12)
    cfg_h = dict(sigma=0.0, fine_n=n, coarse_n=0, cg_maxiter_factor=1,
                 _wave_vectors=jnp.zeros((4, 2)))
    K = D._conductivity(cfg_h, jax.random.key(0), n)
    p = D._solve_pressure(dict(cfg_h, cg_maxiter_factor=1), K)
    # homogeneous Darcy: linear pressure profile, flux exactly 1
    flux = float(jnp.sum(2.0 * K[:, -1] * p[:, -1]))
    assert abs(flux - 1.0) < 1e-5

    # heterogeneous: spectral converges at maxiter n where Jacobi cannot
    sim = D(dict(sigma=1.0, corr_length=0.3, field_method="circulant"))
    cfg = dict(sim.level_instance([1 / 64], [0]).config_dict)
    K = D._conductivity(cfg, jax.random.key(5), 64)
    p_tight = D._solve_pressure(dict(cfg, cg_maxiter_factor=10), K)
    p_spec = D._solve_pressure(dict(cfg, cg_maxiter_factor=1), K)
    p_jac = D._solve_pressure(
        dict(cfg, cg_maxiter_factor=1, precond="jacobi"), K)
    flux = lambda p: float(jnp.sum(2.0 * K[:, -1] * p[:, -1]))
    assert abs(flux(p_spec) - flux(p_tight)) < 1e-4 * abs(flux(p_tight))
    assert abs(flux(p_jac) - flux(p_tight)) > 1e-2 * abs(flux(p_tight))


def test_fractured_cg_budget():
    """Discontinuous 1e3-contrast fracture fields need ~24n CG iterations
    at 64^2 — the smooth-field default cap (10n) silently returned fluxes
    3-43% off. FracturedDiffusionSimulation raises its default cap to 32n;
    this pins the default-config flux to a 64n-budget reference."""
    import jax
    import jax.numpy as jnp
    from mlmc_tpu.random.frac_geom import FracturedDiffusionSimulation as F

    sim = F(dict(sigma=1.0, corr_length=0.2, field_method="circulant",
                 frac_contrast=1e3))
    cfg = dict(sim.level_instance([1 / 64], [0]).config_dict)
    assert "cg_maxiter_factor" not in cfg  # the class default must apply
    flux = lambda K, p: float(jnp.sum(2.0 * K[:, -1] * p[:, -1]))
    for seed in (0, 2, 4):  # seed 2/4 were the worst offenders at 10n
        K = F._conductivity(cfg, jax.random.key(seed), 64)
        f_def = flux(K, F._solve_pressure(cfg, K))
        f_ref = flux(K, F._solve_pressure(dict(cfg, cg_maxiter_factor=64), K))
        assert abs(f_def - f_ref) < 1e-3 * abs(f_ref)


def test_scaled_spectral_high_contrast():
    """sigma=2 lognormal at 64^2: the diagonally-scaled spectral
    preconditioner (M = W C_1^{-1} W, W^2 = diag_C / diag_A) converges
    within a 1x64 iteration budget. The plain geometric-mean
    constant-coefficient inverse needs hundreds to thousands of
    iterations on such fields (measured: worst draw >2000), so this
    budget is the regression guard for the scaled form."""
    import jax.numpy as jnp
    from mlmc_tpu.sim.diffusion import DiffusionSimulation as D

    sim = D(dict(sigma=2.0, corr_length=0.2, field_method="circulant"))
    cfg = dict(sim.level_instance([1 / 64], [0]).config_dict)
    flux = lambda K, p: float(jnp.sum(2.0 * K[:, -1] * p[:, -1]))
    for seed in (3, 4):
        K = D._conductivity(cfg, jax.random.key(seed), 64)
        p_ref = D._solve_pressure(dict(cfg, cg_maxiter_factor=20), K)
        p_tight = D._solve_pressure(dict(cfg, cg_maxiter_factor=1), K)
        assert abs(flux(K, p_tight) - flux(K, p_ref)) \
            < 1e-4 * abs(flux(K, p_ref))


def test_mg_galerkin_coarsening_identity():
    """The coarsened face transmissibilities reproduce P^T A P exactly
    (P = 2x2 piecewise-constant aggregation): coarse MG levels solve the
    true Galerkin operator, not an approximation."""
    import jax
    import jax.numpy as jnp
    from mlmc_tpu.sim.diffusion import DiffusionSimulation as DS

    n = 8
    rng = np.random.default_rng(0)
    K = jnp.asarray(np.exp(rng.normal(0, 2, (n, n))))  # rough field
    Kx, Ky = DS._face_conductivities(K)
    Kl, Kr = 2.0 * K[:, 0], 2.0 * K[:, -1]

    # dense fine operator
    eye = jnp.eye(n * n)
    A = np.asarray(jax.vmap(
        lambda c: DS._stencil_matvec(c.reshape(n, n), Kx, Ky, Kl, Kr).reshape(-1),
        out_axes=1)(eye))

    # P: fine cell (i, j) -> coarse cell (i//2, j//2)
    m = n // 2
    P = np.zeros((n * n, m * m))
    for fi in range(n):
        for fj in range(n):
            P[fi * n + fj, (fi // 2) * m + (fj // 2)] = 1.0
    A_c_ref = P.T @ A @ P

    cKx, cKy, cKl, cKr = DS._galerkin_coarsen(Kx, Ky, Kl, Kr)
    eye_c = jnp.eye(m * m)
    A_c = np.asarray(jax.vmap(
        lambda c: DS._stencil_matvec(c.reshape(m, m), cKx, cKy, cKl, cKr).reshape(-1),
        out_axes=1)(eye_c))
    assert np.abs(A_c - A_c_ref).max() < 1e-10 * np.abs(A_c_ref).max()


def test_mg_preconditioner_beats_spectral_on_fractures():
    """MG-CG needs far fewer iterations than scaled-spectral CG on
    high-contrast fracture fields, and both converge to the same flux."""
    import jax
    import jax.numpy as jnp
    from mlmc_tpu.sim.diffusion import DiffusionSimulation as DS
    from mlmc_tpu.random.frac_geom import FracturedDiffusionSimulation as F

    n = 32
    cfg = dict(sigma=1.0, corr_length=0.2, field_method="circulant",
               frac_contrast=1e3)
    sim = F(cfg)
    lcfg = dict(sim.level_instance([1.0 / n], [0]).config_dict)
    assert lcfg.get("precond", F.PRECOND) == "mg" or "precond" not in lcfg

    def pcg_iters(K, M, tol=1e-6, maxiter=3000):
        Kx, Ky = DS._face_conductivities(K)
        Kl, Kr = 2.0 * K[:, 0], 2.0 * K[:, -1]
        mv = lambda p: DS._stencil_matvec(
            p.reshape(n, n), Kx, Ky, Kl, Kr).reshape(-1)
        b = np.zeros((n, n))
        b[:, 0] = np.asarray(Kl)
        b = jnp.asarray(b.reshape(-1))
        x = jnp.zeros_like(b)
        r = b - mv(x)
        z = M(r)
        p = z
        rz = jnp.vdot(r, z)
        bnorm = float(jnp.linalg.norm(b))
        for it in range(maxiter):
            Ap = mv(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            if float(jnp.linalg.norm(r)) <= tol * bnorm:
                return it + 1, x
            z = M(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        return maxiter, x

    worst_ratio = np.inf
    for seed in (0, 1):
        K = F._conductivity(lcfg, jax.random.key(seed), n)
        Kx, Ky = DS._face_conductivities(K)
        Kl, Kr = 2.0 * K[:, 0], 2.0 * K[:, -1]
        diag = DS._stencil_diag(Kx, Ky, Kl, Kr, n)

        M_mg = DS._mg_vcycle_preconditioner(Kx, Ky, Kl, Kr, n)
        Sx, Cy, lam = DS._spectral_basis(n)
        Sx, Cy, lam = (jnp.asarray(a, K.dtype) for a in (Sx, Cy, lam))
        w = jnp.sqrt(jnp.asarray(DS._const_diag(n), K.dtype) / diag)
        M_sp = lambda r: (w * (Cy.T @ ((Cy @ (w * r.reshape(n, n)) @ Sx.T)
                                       / lam) @ Sx)).reshape(-1)

        it_mg, x_mg = pcg_iters(K, M_mg)
        it_sp, x_sp = pcg_iters(K, M_sp)
        flux = lambda x: float(jnp.sum(2.0 * K[:, -1] * x.reshape(n, n)[:, -1]))
        assert abs(flux(x_mg) - flux(x_sp)) < 5e-3 * max(abs(flux(x_sp)), 1.0)
        worst_ratio = min(worst_ratio, it_sp / it_mg)
    assert worst_ratio > 3.0, worst_ratio
