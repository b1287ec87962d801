"""Bayesian optimal experimental design — expected information gain,
beyond-reference tier.

Ranks candidate experiments BEFORE any data exist: the expected
information gain (EIG, Lindley 1956) of a design is the expected
KL divergence from prior to posterior,

    EIG = E_{theta, y}[ log p(y|theta) - log p(y) ]
        = E_{theta0, y ~ p(.|theta0)}[ -log E_{theta'}[ exp(
              ll(y|theta') - ll(y|theta0) ) ] ],

the second form factoring out ``ll(y|theta0)`` so the inner average is
of likelihood RATIOS <= O(1) — the numerically stable nested-MC shape
(the naive inner mean of raw likelihoods underflows for informative
designs). This is exactly a nested expectation with outer functional
``g = -log``, so the whole machinery of mlmc_tpu/nested.py applies:

* :func:`eig_nmc` — the plain nested estimator at a fixed inner count
  (Ryan 2003): one device program, O(1/N_inner) bias (UPWARD, by
  Jensen on the concave log), an outer-CLT standard error;
* :func:`expected_information_gain` — MLMC over the inner count with
  the antithetic coupling driven by randomized truncation
  (Goda, Hironaka & Iwamoto, "Multilevel Monte Carlo estimation of the
  expected value of sample information" / SIAM-JUQ 2020 line of work):
  UNBIASED EIG with a pure statistical error bar.

Closed form for validation: linear design ``y = G theta + noise``,
``theta ~ N(0, I)`` gives ``EIG = 0.5 logdet(I + G G^T / noise^2)``
(:func:`linear_gaussian_eig`) — Gaussian mutual information.

TPU-first: each outer scenario and inner ratio derives from the
(key, offset) contract of the nested tier, so the [C, block] inner
blocks evaluate inside the drivers' chunk-loop executables; design
comparison is embarrassingly parallel across designs.
"""
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.nested import nested_level_fn, nested_value_fn

__all__ = ["make_eig_inner", "eig_nmc", "expected_information_gain",
           "linear_gaussian_eig"]


def linear_gaussian_eig(G, noise_std):
    """EIG of the linear design y = G theta + N(0, noise^2 I):
    0.5 logdet(I_K + G G^T / noise^2) nats."""
    G = np.asarray(G, dtype=np.float64)
    noise = np.broadcast_to(np.asarray(noise_std, np.float64),
                            (G.shape[0],))
    S = G @ G.T / np.outer(noise, noise) + np.eye(G.shape[0])
    return 0.5 * float(np.linalg.slogdet(S)[1])


def _neg_log(m):
    return -jnp.log(jnp.maximum(m, jnp.finfo(m.dtype).tiny))


def make_eig_inner(forward: Callable, noise_std, d: int):
    """Nested-tier inner function for the EIG of ``forward``.

    :param forward: design-specific ``theta [d] -> obs [K]`` pure jnp.
    :param noise_std: observation noise sd (scalar or [K]).
    :return: ``inner_fn(outer_keys [C], inner_offsets [n]) -> [C, n]``
        of likelihood ratios ``exp(ll(y|theta') - ll(y|theta0))``; the
        outer scenario (theta0, y) derives from the key, inner prior
        draws theta' from ``fold_in(key, 1 + offset)`` (the nested
        (key, offset) contract, so level couplings share prefixes).
    """
    obs_shape = jax.eval_shape(forward, jnp.zeros(d)).shape

    def inner_fn(outer_keys, inner_offsets):
        def per_outer(key):
            k_sc = jax.random.fold_in(key, 0)
            th0 = jax.random.normal(jax.random.fold_in(k_sc, 0), (d,))
            eps = jax.random.normal(jax.random.fold_in(k_sc, 1),
                                    obs_shape)
            noise = jnp.broadcast_to(
                jnp.asarray(noise_std, eps.dtype), obs_shape)
            y = forward(th0) + noise * eps
            ll0 = -0.5 * jnp.sum(eps * eps)       # ll(y|theta0) + const

            def per_inner(off):
                thp = jax.random.normal(
                    jax.random.fold_in(key, 1 + off), (d,))
                r = (y - forward(thp)) / noise
                return jnp.exp(-0.5 * jnp.sum(r * r) - ll0)

            return jax.vmap(per_inner)(inner_offsets)

        return jax.vmap(per_outer)(outer_keys)

    return inner_fn


def eig_nmc(forward: Callable, noise_std, d: int, n_outer: int = 4096,
            n_inner: int = 512, key=None, block: int = 1024,
            chunk_size: int = 512):
    """Nested-MC EIG at a fixed inner count: biased UPWARD by
    O(1/n_inner) (Jensen on -log), with an outer CLT standard error.
    Use :func:`expected_information_gain` to remove the bias.

    :return: dict with ``eig`` (nats), ``se``, ``n_forward``.
    """
    if key is None:
        key = jax.random.key(0)
    if n_inner > 1 and n_inner % 2:
        raise ValueError("n_inner must be even")
    inner = make_eig_inner(forward, noise_std, d)
    fn = jax.jit(nested_value_fn(inner, g=_neg_log, n0=n_inner,
                                 block=block), static_argnums=0)
    parts = []
    for s in range(0, n_outer, chunk_size):
        c = min(chunk_size, n_outer - s)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(s, s + c, dtype=jnp.uint32))
        parts.append(fn((0,), keys))      # stays on device: dispatches
    # overlap compute with transfer: ONE pipelined fetch at the end
    # (per-chunk device_get would stall each next dispatch on a ~30 ms
    # tunnel round trip — see CLAUDE.md fetch discipline)
    vals = np.concatenate([np.asarray(p, dtype=np.float64)
                           for p in jax.device_get(parts)])
    return {"eig": float(vals.mean()),
            "se": float(vals.std(ddof=1) / np.sqrt(len(vals))),
            "n_forward": n_outer * (n_inner + 1)}


def expected_information_gain(forward: Callable, noise_std, d: int,
                              target_var: float = 1e-4, n0: int = 4,
                              r: float = 2.0 ** -1.25, seed: int = 0,
                              block: int = 1024,
                              chunk_size: Optional[Callable] = None,
                              max_rounds: int = 20):
    """UNBIASED EIG: MLMC over the inner count (level l uses
    ``n0 2^l`` inner ratios, antithetic corrections) under randomized
    truncation — the estimate carries only a statistical error.

    The smooth ``-log`` outer functional gives correction variance
    decay beta ~ 2 against cost growth gamma = 1, so the default
    ``r = 2^-1.25`` sits inside the Rhee-Glynn admissible band.

    :return: the driver's estimate dict (``mean`` is the EIG in nats,
        ``se``, per-level diagnostics) plus ``n_forward``.
    """
    from mlmc_tpu.unbiased import GeometricLevels, UnbiasedMLMC

    inner = make_eig_inner(forward, noise_std, d)
    lvl = nested_level_fn(inner, g=_neg_log, n0=n0, block=block)
    mc = UnbiasedMLMC(
        lvl, GeometricLevels(r), seed=seed,
        cost_fn=lambda l: float(n0) * 2.0 ** l,
        chunk_size=chunk_size or (lambda l: max(4096 >> l, 64)))
    out = mc.run(target_var=target_var, max_rounds=max_rounds)
    out["se"] = float(np.sqrt(out["var"]))
    out["n_forward"] = int(sum(
        n * (n0 * (1 << int(l)) + 1)
        for l, n in zip(out["levels"], out["n_samples"])))
    return out
