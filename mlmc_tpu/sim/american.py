"""American/Bermudan option pricing by Longstaff-Schwartz regression —
beyond-reference tier.

Optimal stopping completes the SDE family (mlmc_tpu/sim/sde.py prices
EUROPEAN-style path payoffs): a Bermudan claim may be exercised at any
of N dates, so its value is a backward dynamic program over the
continuation value E[V_{i+1} | S_i]. Longstaff & Schwartz (Rev. Fin.
Stud. 14, 2001) estimate that conditional expectation by least-squares
regression of realized discounted cashflows onto basis functions of
the state, restricted to in-the-money paths.

TPU-first design: the whole backward induction is ONE jitted
``lax.scan`` over exercise dates — per date a basis Vandermonde
[B, K], its normal equations by one MXU ``G^T W G`` [K, K], a
K-dimensional solve, and a masked cashflow update; the path panel
[B, N] is simulated forward in the same program (exact GBM transitions
or Euler/Milstein substeps). Nothing touches the host until the final
price statistics. With a ``mesh``, paths shard across devices and only
the [K, K] normal equations cross the ICI (one ``psum`` per date) —
the regression is EXACTLY the pooled one, not an average of per-shard
fits.

Foresight-bias control is the standard two-pass scheme: the stopping
rule (regression coefficients) is FIT on one path set, then FROZEN and
applied to an independent set — the reported ``price`` is that
out-of-sample estimate (a true lower bound in expectation, up to the
CLT error); the in-sample value is returned alongside as the
optimistic side of the bracket.

Validated against a host CRR binomial Bermudan backward induction on
the same exercise dates (:func:`bermudan_binomial`), the
American-call-equals-European-call identity on non-dividend GBM, and
the early-exercise premium ordering (tests/test_american.py).

No reference analogue: GeoMop/MLMC has no optimal-stopping capability.
"""
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["lsmc_price", "put_payoff", "call_payoff",
           "bermudan_binomial"]


def put_payoff(strike):
    return lambda s: jnp.maximum(strike - s, 0.0)


def call_payoff(strike):
    return lambda s: jnp.maximum(s - strike, 0.0)


def _poly_basis(x, degree):
    """Monomials of the normalized state, [B] -> [B, degree + 1]."""
    return jnp.stack([x ** k for k in range(degree + 1)], axis=1)


def bermudan_binomial(s0, strike, rate, sigma, T, n_dates,
                      n_steps=4096, kind="put"):
    """Host CRR binomial Bermudan price (exercise allowed only at the
    ``n_dates`` equispaced dates h, 2h, ..., T): the validation
    reference for :func:`lsmc_price`. ``n_steps`` must be a multiple
    of ``n_dates``."""
    if n_steps % n_dates:
        raise ValueError("n_steps must be a multiple of n_dates")
    if kind not in ("put", "call"):
        raise ValueError("kind must be 'put' or 'call'")
    dt = T / n_steps
    u = np.exp(sigma * np.sqrt(dt))
    d = 1.0 / u
    disc = np.exp(-rate * dt)
    p = (np.exp(rate * dt) - d) / (u - d)
    j = np.arange(n_steps + 1)
    s = s0 * u ** j * d ** (n_steps - j)
    v = np.maximum(strike - s, 0.0) if kind == "put" \
        else np.maximum(s - strike, 0.0)
    per_date = n_steps // n_dates
    for step in range(n_steps - 1, -1, -1):
        v = disc * (p * v[1:] + (1 - p) * v[:-1])
        if step and step % per_date == 0:
            s = s0 * u ** j[:step + 1] * d ** (step - j[:step + 1])
            ex = (np.maximum(strike - s, 0.0) if kind == "put"
                  else np.maximum(s - strike, 0.0))
            v = np.maximum(v, ex)
    return float(v[0])


def lsmc_price(payoff: Callable, s0: float, rate: float, T: float,
               n_dates: int, sigma: Optional[float] = None,
               model=None, scheme: str = "euler", n_sub: int = 1,
               degree: int = 3, n_paths: int = 1 << 16,
               key=None, scale: Optional[float] = None,
               itm_only: bool = True, dtype=None, mesh=None):
    """Price a Bermudan claim ``payoff(S_t)`` exercisable at the dates
    ``h, 2h, ..., T`` (h = T/n_dates) by Longstaff-Schwarz regression.

    Dynamics: exact GBM transitions under the risk-neutral drift when
    ``sigma`` is given (no discretization error), else an
    :class:`~mlmc_tpu.sim.sde.SDEModel` integrated with ``n_sub``
    Euler/Milstein substeps per date.

    :param payoff: immediate exercise value ``s [B] -> [B]`` pure jnp.
    :param degree: polynomial regression degree in ``s / scale``
        (basis size K = degree + 1).
    :param scale: state normalization for the basis (default ``s0``).
    :param itm_only: restrict the regression to in-the-money paths
        (the Longstaff-Schwartz recommendation; exercise decisions are
        only ever made there).
    :param mesh: optional :class:`~mlmc_tpu.parallel.mesh.SampleMesh`
        — paths shard across devices; the per-date normal equations
        are ``psum``-pooled so the fit is exactly the global one.
    :return: dict with ``price`` (out-of-sample, the honest lower
        bound), ``price_se``, ``price_insample``, ``european`` (same
        paths, no early exercise — a paired control), ``coef``
        [n_dates - 1, K] frozen stopping rule, ``exercise_frac``,
        ``wall_s``.
    """
    if n_dates < 1:
        raise ValueError("n_dates must be >= 1")
    if (sigma is None) == (model is None):
        raise ValueError("pass exactly one of sigma (exact GBM) / model")
    if key is None:
        key = jax.random.key(0)
    dtype = jnp.dtype(dtype or jnp.result_type(float))
    scale = float(scale if scale is not None else s0)
    h = T / n_dates
    disc = float(np.exp(-rate * h))
    K = degree + 1
    B = int(n_paths)
    k_fit, k_eval = jax.random.split(key)

    if sigma is not None:
        drift_h = float((rate - 0.5 * sigma ** 2) * h)
        vol_h = float(sigma * np.sqrt(h))

        def date_step(s, kk, i):
            z = jax.random.normal(kk, s.shape, dtype)
            return s * jnp.exp(drift_h + vol_h * z)
    else:
        from mlmc_tpu.sim.sde import _scheme_increment

        if scheme == "milstein" and model.diffusion_ds is None:
            raise ValueError("Milstein needs SDEModel.diffusion_ds")
        dt = h / n_sub

        def date_step(s, kk, i):
            z = jax.random.normal(kk, (n_sub,) + s.shape, dtype)
            for j in range(n_sub):
                t = i * h + j * dt
                s = s + _scheme_increment(model, scheme, s, t,
                                          np.sqrt(dt) * z[j], dt)
            return s

    def _mark(z):
        """Tag a value as device-varying inside shard_map (scan carries
        must enter with their steady-state vma type)."""
        if mesh is None:
            return z
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(z, (axis,), to="varying")
        return jax.lax.pvary(z, (axis,))

    def simulate(kr, n_loc):
        """Forward panel: [n_dates, n_loc] states at the dates."""
        keys = jax.random.split(kr, n_dates)
        s0v = _mark(jnp.full((n_loc,), s0, dtype))

        def fwd(s, xs):
            kk, i = xs
            s = date_step(s, kk, i)
            return s, s

        _, panel = jax.lax.scan(fwd, s0v, (keys, jnp.arange(n_dates)))
        return panel

    psum = (jax.lax.psum if mesh is not None else
            lambda x, axis_name: x)
    axis = mesh.axis_name if mesh is not None else None

    def normal_fit(G, w, y):
        """Pooled weighted least squares across shards: [K, K] normal
        equations + ridge at f32 scale."""
        Gw = G * w[:, None]
        A = psum(jnp.matmul(Gw.T, G,
                            precision=jax.lax.Precision.HIGHEST),
                 axis_name=axis)
        b = psum(Gw.T @ y, axis_name=axis)
        nw = psum(jnp.sum(w), axis_name=axis)
        eps = (1e-7 if jnp.finfo(dtype).bits < 64 else 1e-13)
        A = A + eps * jnp.maximum(nw, 1.0) * jnp.eye(K, dtype=dtype)
        return jnp.linalg.solve(A, b)

    def backward(panel, coefs, fit):
        """Backward induction over dates n_dates-1 .. 1. ``fit``
        (static): regress and emit coefficients; else apply the frozen
        [n_dates - 1, K] stack."""
        v = payoff(panel[-1])                       # value at T
        xs = (panel[:-1][::-1], coefs[::-1])

        def bwd(v, xs):
            s, c = xs
            v = disc * v
            x = s / scale
            G = _poly_basis(x, degree)
            ex = payoff(s)
            w = ((ex > 0).astype(dtype) if itm_only
                 else jnp.ones_like(ex))
            if fit:
                c = normal_fit(G, w, v)
            cont = G @ c
            take = (ex > 0) & (ex > cont)
            v = jnp.where(take, ex, v)
            return v, (c, take.astype(dtype))

        v, (cs, takes) = jax.lax.scan(bwd, v, xs)
        price = disc * v                             # discount to t=0
        return price, cs[::-1], takes

    def make_run(fit):
        def run(kr, coefs):
            n_loc = B // mesh.n_devices if mesh is not None else B
            panel = simulate(kr, n_loc)
            price, cs, takes = backward(panel, coefs, fit)
            euro = (disc ** n_dates) * payoff(panel[-1])
            stats = jnp.stack([
                psum(jnp.sum(price), axis_name=axis),
                psum(jnp.sum(price * price), axis_name=axis),
                psum(jnp.sum(euro), axis_name=axis),
                psum(jnp.mean(takes, axis=1).sum(), axis_name=axis)
                / (mesh.n_devices if mesh is not None else 1.0),
            ])
            return stats, cs

        if mesh is None:
            return jax.jit(run)
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:                          # older jax
            from jax.experimental.shard_map import shard_map
        if B % mesh.n_devices:
            raise ValueError(f"n_paths={B} must divide by the mesh's "
                             f"{mesh.n_devices} devices")

        def sharded(kr, coefs):
            kr = jax.random.fold_in(kr, jax.lax.axis_index(axis))
            return run(kr, coefs)

        return jax.jit(shard_map(
            sharded, mesh=mesh.mesh, in_specs=(P(), P()),
            out_specs=(P(), P())))

    t0 = time.perf_counter()
    dummy = jnp.zeros((max(n_dates - 1, 1), K), dtype)[:n_dates - 1]
    if n_dates == 1:
        stats, _ = jax.device_get(make_run(False)(k_eval, dummy))
        s_sum, s_sq, e_sum, _ = [float(x) for x in np.asarray(stats)]
        price = s_sum / B
        se = float(np.sqrt(max(s_sq / B - price ** 2, 0.0) / B))
        return {"price": price, "price_se": se,
                "price_insample": price, "european": e_sum / B,
                "coef": np.zeros((0, K)), "exercise_frac": 0.0,
                "wall_s": time.perf_counter() - t0}
    # pass 1: fit the stopping rule; in-sample price rides along
    stats_in, coefs = make_run(True)(k_fit, dummy)
    # pass 2: frozen rule on independent paths
    stats, _ = make_run(False)(k_eval, coefs)
    (stats_in, stats), coefs = jax.device_get(
        ((stats_in, stats), coefs))
    s_sum, s_sq, e_sum, takes = [float(x) for x in np.asarray(stats)]
    price = s_sum / B
    se = float(np.sqrt(max(s_sq / B - price ** 2, 0.0) / B))
    return {"price": price, "price_se": se,
            "price_insample": float(np.asarray(stats_in)[0]) / B,
            "european": e_sum / B,
            "coef": np.asarray(coefs, np.float64),
            "exercise_frac": takes / max(n_dates - 1, 1),
            "wall_s": time.perf_counter() - t0}
