"""Risk measures and optimization under uncertainty —
beyond-reference tier.

Two capabilities the reference framework (forward-moment estimation
only) does not have:

* **Multilevel CVaR/VaR** (:func:`cvar_mlmc`): tail risk of a
  discretized QoI at MLMC cost. VaR comes from the multilevel CDF
  tier's quantile (mlmc_tpu/cdf_estimate.py); the expected shortfall
  then telescopes the Rockafellar-Uryasev tail expectation

      CVaR_a(X) = t + E[(X - t)+] / (1 - a)   at  t = VaR_a(X),

  whose integrand is LIPSCHITZ — unlike the CDF's indicators it needs
  no smoothing: the per-level corrections decay at the coupling's
  strong rate as-is, and the RU objective is STATIONARY at t = VaR, so
  a O(se) quantile error perturbs CVaR only at O(se^2) (the reported
  error adds the realized first-order residual ``|1 - p_tail/(1-a)|
  * se_t`` honestly instead of assuming exact stationarity).

* **Differentiable MLMC** (:func:`mlmc_gradient`,
  :func:`optimize_expectation`, :func:`optimize_cvar`): pathwise
  (reparameterization) gradients of telescoped expectations —
  ``jax.grad`` flows through every coupled level program, so
  ``grad E[f_L(theta)]`` is estimated with MLMC economics (gradient
  corrections inherit the coupling's variance decay; most samples land
  on coarse levels). The optimization drivers compile the WHOLE
  stochastic-gradient loop — per-step fresh keys, every level's
  value+gradient, the optax update — into ONE jitted ``lax.scan``:
  zero host round trips between steps. CVaR optimization uses the
  joint Rockafellar-Uryasev form ``min_{theta,t} t + E[spp_delta(
  f(theta) - t)]/(1-a)`` with a softplus-smoothed positive part
  (bias <= delta*log2, stated, -> 0 with the smoothing).

Level contract (shared with the CDF/unbiased tiers):
``pair_fn(level, keys [C]) -> (fine [C], coarse [C], valid [C])``;
for the gradient drivers ``obj_fn(level, theta, keys [C])`` with the
same return. The coupling is the shared key chunk.

No reference analogue; the reference's torch-free numpy pipeline
cannot differentiate through its estimators at all.
"""
import time
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["cvar_empirical", "cvar_mlmc", "mlmc_gradient",
           "optimize_expectation", "optimize_cvar"]


def _check_alpha(alpha):
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")


def cvar_empirical(samples, alpha: float):
    """Single-level empirical VaR/CVaR with CLT standard errors.

    :return: dict(var, cvar, cvar_se, n_tail)
    """
    _check_alpha(alpha)
    x = np.sort(np.asarray(samples, np.float64).ravel())
    n = x.size
    if n < 2:
        raise ValueError("need >= 2 samples")
    t = x[min(int(np.ceil(alpha * n)) - 1, n - 1)]
    tail = np.maximum(x - t, 0.0)
    m = tail.mean()
    se = tail.std(ddof=1) / np.sqrt(n) / (1.0 - alpha)
    return {"var": float(t), "cvar": float(t + m / (1.0 - alpha)),
            "cvar_se": float(se), "n_tail": int(np.sum(x > t))}


def _tail_program(pair_fn, level, chunk, dtype, root):
    """One executable per level for the telescoped tail expectation:
    Kahan-accumulated sum/sum^2 of ``(fine-t)+ - (coarse-t)+`` over a
    dynamic number of chunks; ``t`` is an OPERAND (quantile refinements
    reuse the executable). Returns [sum, sum2, n_valid] as one flat
    fetch."""
    lkey = jax.random.fold_in(root, level)
    is_l0 = level == 0

    @jax.jit
    def run(start, n_chunks, t):
        def body(c, carry):
            (s, s2), (cs, cs2), nv = carry
            idx = (c * jnp.uint32(chunk)
                   + jnp.arange(chunk, dtype=jnp.uint32))
            keys = jax.vmap(lambda i: jax.random.fold_in(lkey, i))(idx)
            fine, coarse, valid = pair_fn(level, keys)
            fine = fine.astype(dtype)
            valid = valid & jnp.isfinite(fine)
            d = jnp.maximum(fine - t, 0.0)
            if not is_l0:
                coarse = coarse.astype(dtype)
                valid = valid & jnp.isfinite(coarse)
                d = d - jnp.maximum(coarse - t, 0.0)
            d = jnp.where(valid, d, 0.0)
            out = []
            for acc, comp, x in ((s, cs, jnp.sum(d)),
                                 (s2, cs2, jnp.sum(d * d))):
                y = x - comp
                tt = acc + y
                out.append((tt, (tt - acc) - y))
            (s, cs), (s2, cs2) = out
            return (s, s2), (cs, cs2), nv + jnp.sum(valid
                                                    ).astype(jnp.uint32)

        z = jnp.zeros((), dtype)
        (s, s2), (cs, cs2), nv = jax.lax.fori_loop(
            start, start + n_chunks, body,
            ((z, z), (z, z), jnp.zeros((), jnp.uint32)))
        return jnp.stack([s - cs, s2 - cs2, nv.astype(dtype)])

    return run


def cvar_mlmc(pair_fn: Callable, n_levels: int, alpha: float,
              target_se: float, bandwidth, quantile_grid=None,
              seed: int = 0, cost_fn: Optional[Callable] = None,
              chunk_size: int = 1 << 12, n_pilot: int = 1 << 14,
              max_rounds: int = 20, kernel_order: int = 2,
              dtype=None, mesh=None):
    """Multilevel VaR + CVaR of the finest-level QoI distribution.

    Stage 1 estimates ``VaR_alpha`` with :class:`~mlmc_tpu.cdf_estimate.
    MultilevelCDF` (grid auto-placed from a level-0 pilot unless
    ``quantile_grid`` is given); stage 2 telescopes the Lipschitz tail
    expectation ``E[(X - VaR)+]`` with sqrt(V/C) allocation to
    ``target_se`` (the CVaR standard error, tail-term CLT + the
    realized first-order quantile residual).

    :param bandwidth: CDF smoothing delta(s), forwarded to the CDF tier
        (sets the O(delta^kernel_order) VaR bias).
    :param cost_fn: optional ``level -> relative cost`` for both stages.
    :return: dict(var, var_se, cvar, cvar_se, tail_mean, tail_se,
        level_corrections, n_per_level, rounds, wall_s, cdf)
    """
    from mlmc_tpu.cdf_estimate import MultilevelCDF

    _check_alpha(alpha)
    if n_levels < 1:
        raise ValueError("need n_levels >= 1")
    dtype = jnp.dtype(dtype or jnp.result_type(float))
    t0 = time.perf_counter()

    # ---- stage 0: pilot at level 0 to place the quantile grid ------ #
    if quantile_grid is None:
        pkey = jax.random.fold_in(jax.random.key(seed), 10_001)
        keys = jax.vmap(
            lambda i: jax.random.fold_in(pkey, i))(
            jnp.arange(n_pilot, dtype=jnp.uint32))
        f0, _, v0 = pair_fn(0, keys)
        f0 = np.asarray(jax.device_get(f0), np.float64)
        v0 = np.asarray(jax.device_get(v0), bool)
        f0 = f0[v0 & np.isfinite(f0)]
        if f0.size < 64:
            raise RuntimeError("pilot produced too few valid samples "
                               "to place the quantile grid")
        q = np.quantile(f0, alpha)
        spread = max(np.quantile(f0, 0.99) - np.quantile(f0, 0.5),
                     1e-12)
        quantile_grid = np.linspace(q - 1.5 * spread, q + 1.5 * spread,
                                    129)

    # ---- stage 1: multilevel quantile ------------------------------ #
    cdf = MultilevelCDF(pair_fn, n_levels, quantile_grid, bandwidth,
                        kernel_order=kernel_order, seed=seed + 1,
                        cost_fn=cost_fn, chunk_size=chunk_size,
                        dtype=dtype, mesh=mesh)
    # quantile se needs ~target_se * (1-alpha) CDF accuracy at the
    # quantile (delta method: se_q = se_F / pdf); drive the CDF run by
    # its own worst-point target, then read the realized quantile se
    cdf.run(target_var=(target_se * (1.0 - alpha)) ** 2,
            max_rounds=max_rounds)
    (t_hat,), (t_se,) = cdf.quantiles([alpha])
    t_hat, t_se = float(t_hat), float(t_se)

    # ---- stage 2: telescoped tail expectation ---------------------- #
    root = jax.random.key(seed + 2)
    programs = [_tail_program(pair_fn, lv, chunk_size, dtype, root)
                for lv in range(n_levels)]
    sums = np.zeros(n_levels)
    sums2 = np.zeros(n_levels)
    nval = np.zeros(n_levels)
    ndrawn = np.zeros(n_levels, dtype=np.int64)
    elapsed = np.zeros(n_levels)
    t_op = jnp.asarray(t_hat, dtype)

    def extend(lv, n_add):
        n_chunks = -(-int(n_add) // chunk_size)
        if n_chunks <= 0:
            return
        start = ndrawn[lv] // chunk_size
        tt = time.perf_counter()
        flat = np.asarray(jax.device_get(
            programs[lv](jnp.uint32(start), jnp.uint32(n_chunks),
                         t_op)), np.float64)
        elapsed[lv] += time.perf_counter() - tt
        sums[lv] += flat[0]
        sums2[lv] += flat[1]
        nval[lv] += flat[2]
        ndrawn[lv] += n_chunks * chunk_size

    for lv in range(n_levels):
        extend(lv, max(chunk_size, n_pilot // 4))

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        mean_l = sums / np.maximum(nval, 1)
        var_l = np.maximum(
            sums2 / np.maximum(nval, 1) - mean_l ** 2, 1e-30)
        tail_var = np.sum(var_l / np.maximum(nval, 1))
        if np.sqrt(tail_var) / (1.0 - alpha) <= target_se * 0.9:
            break
        cost = (np.array([cost_fn(lv) for lv in range(n_levels)])
                if cost_fn is not None
                else np.maximum(elapsed / np.maximum(ndrawn, 1), 1e-12))
        target_tail_var = (target_se * 0.9 * (1.0 - alpha)) ** 2
        lam = np.sum(np.sqrt(var_l * cost)) / target_tail_var
        n_opt = np.ceil(lam * np.sqrt(var_l / cost)).astype(np.int64)
        added = False
        for lv in range(n_levels):
            add = min(n_opt[lv] - ndrawn[lv], 8 * chunk_size * 2 ** max(
                0, n_levels - 1 - lv))
            if add > 0:
                extend(lv, add)
                added = True
        if not added:
            break

    mean_l = sums / np.maximum(nval, 1)
    var_l = np.maximum(sums2 / np.maximum(nval, 1) - mean_l ** 2, 0.0)
    tail_mean = float(np.sum(mean_l))
    tail_se = float(np.sqrt(np.sum(var_l / np.maximum(nval, 1))))
    # realized tail probability for the first-order quantile residual:
    # dCVaR/dt = 1 - P(X > t)/(1-alpha) -> 0 at the true quantile
    est = cdf.estimates()
    p_tail = 1.0 - float(np.interp(t_hat, est["x"], est["cdf"]))
    resid = abs(1.0 - p_tail / (1.0 - alpha)) * t_se
    cvar_se = float(np.hypot(tail_se / (1.0 - alpha), resid))
    return {"var": t_hat, "var_se": t_se,
            "cvar": t_hat + tail_mean / (1.0 - alpha),
            "cvar_se": cvar_se, "tail_mean": tail_mean,
            "tail_se": tail_se, "level_corrections": mean_l,
            "n_per_level": ndrawn.copy(), "rounds": rounds,
            "wall_s": time.perf_counter() - t0, "cdf": est}


# --------------------------------------------------------------------- #
# Differentiable MLMC
# --------------------------------------------------------------------- #

def _level_keys(root, level, step, n, offset=0):
    lkey = jax.random.fold_in(jax.random.fold_in(root, level), step)
    return jax.vmap(lambda i: jax.random.fold_in(lkey, i))(
        jnp.arange(offset, offset + n, dtype=jnp.uint32))


def _level_value_and_grad(obj_fn, level, theta, keys, dtype):
    """Mean correction and its pathwise gradient at one level. Invalid
    samples are masked OUT of both (mean over valid only)."""

    def mean_d(th):
        fine, coarse, valid = obj_fn(level, th, keys)
        d = fine.astype(dtype)
        valid = valid & jnp.isfinite(d)
        if level > 0:
            c = coarse.astype(dtype)
            valid = valid & jnp.isfinite(c)
            d = d - c
        d = jnp.where(valid, d, 0.0)
        nv = jnp.maximum(jnp.sum(valid.astype(dtype)), 1.0)
        # second moment rides along for the variance diagnostic
        return jnp.sum(d) / nv, (jnp.sum(d * d) / nv, nv)

    (val, (m2, nv)), grad = jax.value_and_grad(
        mean_d, has_aux=True)(theta)
    return val, grad, m2 - val * val, nv


def mlmc_gradient(obj_fn: Callable, theta, n_levels: int,
                  n_per_level, key=None, dtype=None):
    """Telescoped value AND pathwise gradient of ``E[f_L(theta)]``.

    :param obj_fn: ``(level, theta, keys [C]) -> (fine [C], coarse [C],
        valid [C])`` pure jnp, differentiable in ``theta`` (coarse
        ignored at level 0); the shared key chunk is the coupling.
    :param n_per_level: int or per-level sequence of sample counts.
    :return: dict(value, grad (theta pytree), level_values,
        level_variances, n_valid) — variances are of the VALUE
        corrections (the allocation diagnostic).
    """
    if key is None:
        key = jax.random.key(0)
    dtype = jnp.dtype(dtype or jnp.result_type(float))
    n_per = ([int(n_per_level)] * n_levels
             if np.isscalar(n_per_level) else list(n_per_level))
    if len(n_per) != n_levels:
        raise ValueError(f"n_per_level gives {len(n_per)} levels, "
                         f"expected {n_levels}")
    theta = jax.tree.map(lambda a: jnp.asarray(a, dtype), theta)

    @jax.jit
    def run(theta):
        vals, grads, varis, nvs = [], [], [], []
        for lv in range(n_levels):
            keys = _level_keys(key, lv, 0, n_per[lv])
            v, g, s2, nv = _level_value_and_grad(obj_fn, lv, theta,
                                                 keys, dtype)
            vals.append(v)
            grads.append(g)
            varis.append(s2)
            nvs.append(nv)
        total_g = jax.tree.map(lambda *gs: sum(gs), *grads)
        return (jnp.stack(vals), total_g, jnp.stack(varis),
                jnp.stack(nvs))

    vals, grad, varis, nvs = jax.device_get(run(theta))
    return {"value": float(np.sum(vals)), "grad": grad,
            "level_values": np.asarray(vals, np.float64),
            "level_variances": np.asarray(varis, np.float64),
            "n_valid": np.asarray(nvs)}


def optimize_expectation(obj_fn: Callable, theta0, n_levels: int,
                         n_per_level, n_steps: int = 200,
                         optimizer=None, key=None, dtype=None):
    """Minimize ``E[f_L(theta)]`` by stochastic gradient descent on
    MLMC pathwise gradients — the WHOLE loop (fresh keys, every level's
    value+grad, the optax update) is ONE jitted ``lax.scan``; nothing
    crosses to the host until the trajectory is fetched.

    :param optimizer: any optax GradientTransformation (default
        ``optax.adam(0.05)``).
    :return: dict(theta, values [n_steps] (per-step MLMC estimates of
        the CURRENT objective), grad_norms [n_steps], wall_s)
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(0.05)
    if key is None:
        key = jax.random.key(0)
    dtype = jnp.dtype(dtype or jnp.result_type(float))
    n_per = ([int(n_per_level)] * n_levels
             if np.isscalar(n_per_level) else list(n_per_level))
    if len(n_per) != n_levels:
        raise ValueError(f"n_per_level gives {len(n_per)} levels, "
                         f"expected {n_levels}")
    theta0 = jax.tree.map(lambda a: jnp.asarray(a, dtype), theta0)

    def step(carry, s):
        theta, opt_state = carry
        val = jnp.zeros((), dtype)
        grad = None
        for lv in range(n_levels):
            keys = _level_keys(key, lv, s, n_per[lv])
            v, g, _, _ = _level_value_and_grad(obj_fn, lv, theta, keys,
                                               dtype)
            val = val + v
            grad = g if grad is None else jax.tree.map(
                jnp.add, grad, g)
        updates, opt_state = optimizer.update(grad, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        gnorm = optax.global_norm(grad)
        return (theta, opt_state), (val, gnorm)

    @jax.jit
    def run(theta0):
        opt_state = optimizer.init(theta0)
        (theta, _), (vals, gnorms) = jax.lax.scan(
            step, (theta0, opt_state),
            jnp.arange(1, n_steps + 1, dtype=jnp.uint32))
        return theta, vals, gnorms

    t0 = time.perf_counter()
    theta, vals, gnorms = jax.device_get(run(theta0))
    return {"theta": theta, "values": np.asarray(vals, np.float64),
            "grad_norms": np.asarray(gnorms, np.float64),
            "wall_s": time.perf_counter() - t0}


def optimize_cvar(obj_fn: Callable, theta0, alpha: float,
                  n_levels: int, n_per_level, n_steps: int = 300,
                  smoothing: float = 0.05, optimizer=None, key=None,
                  t0_init: float = 0.0, dtype=None):
    """Minimize ``CVaR_alpha[f_L(theta)]`` via the joint
    Rockafellar-Uryasev program ``min_{theta, t} t +
    E[spp_delta(f - t)]/(1 - alpha)`` with the softplus-smoothed
    positive part ``spp_delta(x) = delta*log(1+exp(x/delta))``
    (smoothing bias <= delta*log2 -> 0 with ``smoothing``; needed
    because the exact kink has no pathwise derivative AT the VaR).

    At the optimum ``t`` IS (a smoothed) ``VaR_alpha``.

    :return: dict(theta, t (VaR estimate), cvar (final-step RU
        objective estimate), values, grad_norms, wall_s)
    """
    _check_alpha(alpha)
    if smoothing <= 0:
        raise ValueError("smoothing must be positive")
    delta = float(smoothing)

    def ru_obj(level, aug, keys):
        theta, t = aug
        fine, coarse, valid = obj_fn(level, theta, keys)
        spp = lambda x: delta * jax.nn.softplus((x - t) / delta)
        f = t + spp(fine) / (1.0 - alpha)
        c = (t + spp(coarse) / (1.0 - alpha)) if level > 0 else coarse
        return f, c, valid

    out = optimize_expectation(
        ru_obj, (theta0, jnp.asarray(t0_init)), n_levels, n_per_level,
        n_steps=n_steps, optimizer=optimizer, key=key, dtype=dtype)
    theta, t = out["theta"]
    return {"theta": theta, "t": float(np.asarray(t)),
            "cvar": float(out["values"][-1]),
            "values": out["values"], "grad_norms": out["grad_norms"],
            "wall_s": out["wall_s"]}
