"""Sparse-grid stochastic collocation (Smolyak) — beyond-reference tier.

The deterministic counterpart to the sampling estimators: for QoIs that
are SMOOTH in the random parameters, a Smolyak sparse quadrature
(Smolyak 1963; Novak & Ritter 1996; Gerstner & Griebel 1998) converges
spectrally in the number of model evaluations — orders of magnitude
fewer solves than MC/MLMC at moderate dimension (d <~ 20), and the
classic comparison partner for MLMC in the UQ literature (the reference
framework has no collocation capability).

    E[f(theta)]  ~  A(w, d) f = sum_{|i| <= d+w} c_i (Q_{i_1} x ... x Q_{i_d}) f

* **Rules**: probabilists' Gauss-Hermite (N(0,1) inputs, linear growth
  m(i) = i — Novak-Ritter: exact for total degree 2w+1), nested
  Clenshaw-Curtis (uniform inputs on [-1,1], doubling growth
  m(i) = 2^(i-1)+1 — node reuse across levels), Gauss-Legendre.
* **Combination technique**: only multi-indices in the Smolyak band
  ``q-d+1 <= |i| <= q`` contribute, with closed-form coefficients
  ``(-1)^(q-|i|) C(d-1, q-|i|)``.
* **Multilevel collocation** (Teckentrup-Jantsch-Webster-Gunzburger
  2015): spend high sparse-grid levels on coarse models and low levels
  on fine corrections — the MLMC telescope with collocation as the
  level estimator.

TPU-first design: grid construction is host-side integer/area work
(a decision, not a computation); the device sees ONE batched evaluation
``vmap(f)`` over the deduplicated node set [N, d] followed by a
weight dot — MXU-shaped, one dispatch per chunk, vector QoIs free.
Variance comes from integrating ``(f, f^2)`` in the same pass.
"""
import itertools
import math
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["SparseGrid", "multilevel_collocation"]


def _gauss_hermite_1d(n):
    """Probabilists' Gauss-Hermite: exact for N(0,1) moments < 2n.
    hermegauss weights sum to sqrt(2 pi); normalize to probability."""
    x, w = np.polynomial.hermite_e.hermegauss(n)
    return x, w / w.sum()


def _gauss_legendre_1d(n):
    """Gauss-Legendre on [-1, 1] with the UNIFORM probability weight."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w / 2.0


def _clenshaw_curtis_1d(n):
    """Clenshaw-Curtis nodes/weights on [-1, 1], uniform probability
    weight (weights sum to 1). n = 1 gives the midpoint rule."""
    if n == 1:
        return np.zeros(1), np.ones(1)
    j = np.arange(n)
    x = np.cos(np.pi * j / (n - 1))[::-1]
    # exact CC weights by cosine-moment summation
    w = np.zeros(n)
    for k in range(n):
        s = 1.0
        for m in range(1, (n - 1) // 2 + 1):
            term = 2.0 / (1.0 - 4.0 * m * m) * np.cos(
                2.0 * m * np.pi * k / (n - 1))
            if 2 * m == n - 1:
                term *= 0.5
            s += term
        w[k] = 2.0 * s / (n - 1)
    w[0] *= 0.5
    w[-1] *= 0.5
    return x, (w / 2.0)[::-1]


_RULES = {
    "gauss-hermite": (_gauss_hermite_1d, lambda i: i),
    "gauss-legendre": (_gauss_legendre_1d, lambda i: i),
    "clenshaw-curtis": (_clenshaw_curtis_1d,
                        lambda i: 1 if i == 1 else 2 ** (i - 1) + 1),
}


class SparseGrid:
    """Smolyak sparse quadrature over d i.i.d. inputs.

    :param d: input dimension.
    :param level: Smolyak level w >= 0 (w = 0 is the single-node rule).
    :param rule: "gauss-hermite" (N(0,1) inputs), "clenshaw-curtis" or
        "gauss-legendre" (uniform on [-1, 1]).

    Attributes: ``nodes`` [N, d], ``weights`` [N] (sum to 1 within
    roundoff; individual weights may be negative — Smolyak is not a
    positive rule), ``n_nodes``, ``n_tensor`` (the full-tensor count the
    sparse construction avoided).
    """

    def __init__(self, d: int, level: int, rule: str = "gauss-hermite"):
        if rule not in _RULES:
            raise ValueError(f"unknown rule {rule!r}; "
                             f"choose from {sorted(_RULES)}")
        if d < 1 or level < 0:
            raise ValueError("need d >= 1 and level >= 0")
        self.d, self.level, self.rule = d, level, rule
        make_1d, growth = _RULES[rule]
        cache = {}

        def rule_1d(i):
            if i not in cache:
                cache[i] = make_1d(growth(i))
            return cache[i]

        q = d + level
        acc = {}
        # Smolyak band: q-d+1 <= |i| <= q, i_k >= 1
        for excess in range(min(level, q - d) + 1):
            s = q - excess                       # |i|
            coeff = (-1.0) ** excess * math.comb(d - 1, excess)
            for comp in _compositions(s, d):
                xs, ws = zip(*(rule_1d(i) for i in comp))
                for idx in itertools.product(*(range(len(x))
                                               for x in xs)):
                    node = tuple(round(float(xs[k][idx[k]]), 14)
                                 for k in range(d))
                    wgt = coeff
                    for k in range(d):
                        wgt *= ws[k][idx[k]]
                    acc[node] = acc.get(node, 0.0) + wgt
        nodes = np.array(sorted(acc), dtype=np.float64)
        self.nodes = nodes.reshape(len(acc), d)
        self.weights = np.array([acc[tuple(n)] for n in
                                 self.nodes.tolist()])
        self.n_nodes = len(self.weights)
        self.n_tensor = growth(level + 1) ** d

    def integrate(self, fn: Callable, chunk_size: int = 1 << 14,
                  dtype=None):
        """``E[fn(theta)]`` — one vmapped device evaluation over the
        node batch, weight-reduced on device. fn: [d] -> scalar or [q].
        Returns a numpy scalar/vector."""
        dtype = dtype or jnp.asarray(1.0).dtype
        nodes = jnp.asarray(self.nodes, dtype)
        w = jnp.asarray(self.weights, dtype)
        batch = jax.jit(lambda x, ww: jnp.tensordot(
            ww, jax.vmap(fn)(x), axes=1))
        total = None
        for s in range(0, self.n_nodes, chunk_size):
            part = batch(nodes[s:s + chunk_size],
                         w[s:s + chunk_size])
            total = part if total is None else total + part
        return np.asarray(jax.device_get(total))

    def mean_and_var(self, fn: Callable, **kw):
        """(E[f], Var[f]) through one pass integrating (f, f^2).
        Var can come out slightly negative for an under-resolved grid
        (Smolyak weights are signed) — clipped at 0."""
        def f2(theta):
            v = jnp.atleast_1d(fn(theta))
            return jnp.concatenate([v, v * v])
        both = self.integrate(f2, **kw)
        q = both.shape[0] // 2
        mean, second = both[:q], both[q:]
        return mean, np.maximum(second - mean ** 2, 0.0)


def _compositions(total, parts):
    """All tuples of `parts` positive ints summing to `total`."""
    if parts == 1:
        yield (total,)
        return
    for first in range(1, total - parts + 2):
        for rest in _compositions(total - first, parts - 1):
            yield (first,) + rest


def multilevel_collocation(fns: Sequence[Callable], d: int,
                           levels: Optional[Sequence[int]] = None,
                           rule: str = "gauss-hermite",
                           chunk_size: int = 1 << 14):
    """Multilevel stochastic collocation: sparse-grid level w_l on the
    MLMC correction ``f_l - f_{l-1}`` (Teckentrup et al. 2015) — the
    smoother and smaller the correction, the cruder its grid.

    :param fns: per-discretization-level ``theta [d] -> scalar/[q]``,
        coarsest first, all over the SAME parametrization (the coupling
        is by shared collocation nodes — exact, no statistical error).
    :param levels: sparse-grid level per MLMC level, defaults to
        ``[L-1+base, ..., base]`` decreasing to base=1.
    :return: dict with ``mean``, per-level ``corrections``, ``n_nodes``
        per level, ``n_nodes_total`` and the single-level equivalent
        count ``n_nodes_single`` (finest model at the richest grid).
    """
    L = len(fns)
    if levels is None:
        levels = [L - lvl for lvl in range(L)]
    if len(levels) != L:
        raise ValueError("need one sparse-grid level per model level")
    corrections, n_nodes = [], []
    grids = {}                      # grid construction is host-side and
    for w in set(levels):           # slow on 1 core: build each w once
        grids[w] = SparseGrid(d, w, rule=rule)
    for lvl, (fn, w) in enumerate(zip(fns, levels)):
        grid = grids[w]
        if lvl == 0:
            contrib = grid.integrate(
                lambda th: jnp.atleast_1d(fn(th)), chunk_size=chunk_size)
        else:
            prev = fns[lvl - 1]
            contrib = grid.integrate(
                lambda th: jnp.atleast_1d(fn(th))
                - jnp.atleast_1d(prev(th)), chunk_size=chunk_size)
        corrections.append(contrib)
        n_nodes.append(grid.n_nodes)
    return {"mean": sum(corrections), "corrections": corrections,
            "n_nodes": n_nodes, "n_nodes_total": int(np.sum(n_nodes)),
            "n_nodes_single": grids[max(levels)].n_nodes,
            "levels": list(levels)}
