"""Randomized Quantity-algebra oracle sweep (VERDICT r4 item 5).

The deterministic algebra suite (tests/test_quantity_concept.py) ports the
reference's fixed cases; this sweep generates ≥200 RANDOM programs —
getitem chains over nested QDict/QTimeSeries/QField/QArray, ufuncs,
arithmetic with constants and derived operands, time interpolation,
mask/select — and evaluates every one against a pure-numpy oracle whose
M-axis offsets are derived INDEPENDENTLY from the documented layout
(quantity_types.py module docstring: children concatenate along M in
declaration order; each spec slab is time-major, then location, then
C-ordered array shape — reference mlmc/quantity/quantity.py:126-380,
mlmc/quantity/quantity_types.py:9-246).

On a mismatch the failing program is prefix-shrunk to the shortest failing
op sequence and reported as a reproducible (seed, ops) trace.
"""
import numpy as np
import pytest

import mlmc_tpu.quantity.quantity as q_mod
import mlmc_tpu.quantity.quantity_estimate as qe
from mlmc_tpu import Memory, make_root_quantity
from mlmc_tpu.quantity.quantity_spec import ChunkSpec, QuantitySpec

SPECS = [
    QuantitySpec(name="a", unit="m", shape=(2, 3), times=[1, 2],
                 locations=["x", "y"]),
    QuantitySpec(name="b", unit="", shape=(4,), times=[0],
                 locations=["p"]),
    QuantitySpec(name="c", unit="s", shape=(1, 1), times=[1, 2, 3],
                 locations=["q", "r", "s"]),
]
N_LEVELS = 3
NS = [48, 24, 12]


# --------------------------------------------------------------------- #
# independent layout descriptors (the oracle's own offset arithmetic)
# --------------------------------------------------------------------- #

def _meta_size(meta):
    kind = meta[0]
    if kind == "dict":
        return sum(_meta_size(m) for _, m in meta[1])
    if kind in ("ts", "field"):
        return len(meta[1]) * _meta_size(meta[2])
    if kind == "array":
        return int(np.prod(meta[1]))
    return 1  # scalar


def _root_meta():
    def spec_meta(spec):
        leaf = ("array", tuple(spec.shape))
        per_time = ("field", list(spec.locations), leaf)
        return ("ts", list(spec.times), per_time)

    return ("dict", [(s.name, spec_meta(s)) for s in SPECS])


def _keep_dims(arr):
    """Oracle mirror of quantity_types.keep_dims."""
    if arr.ndim == 2:
        return arr[None, :, :]
    lead = int(np.prod(arr.shape[:-2]))
    return arr.reshape((lead,) + arr.shape[-2:])


# --------------------------------------------------------------------- #
# storage fill (deterministic, with NaN-poisoned rows)
# --------------------------------------------------------------------- #

def _root_arrays():
    """Per level: [M, N, C] float64 (level 0: C=1)."""
    M = sum(int(np.prod(s.shape)) * len(s.times) * len(s.locations)
            for s in SPECS)
    out = []
    for lvl, n in enumerate(NS):
        m = np.arange(M, dtype=float)[:, None]
        i = np.arange(n, dtype=float)[None, :]
        fine = np.sin(0.1 * m + 0.05 * i) + 0.3 * lvl + 1.5
        if lvl == 0:
            arr = fine[:, :, None]
        else:
            coarse = 0.9 * fine + 0.2 * np.cos(0.07 * m + 0.01 * i)
            arr = np.stack([fine, coarse], axis=2)
        # two NaN-poisoned samples per level (partial: one component)
        arr[3, 5, 0] = np.nan
        arr[7, n - 2, -1] = np.nan
        out.append(arr)
    return out


@pytest.fixture(scope="module")
def store_and_oracle():
    arrays = _root_arrays()
    storage = Memory()
    storage.save_global_data(result_format=SPECS,
                             level_parameters=[[0.5], [0.25], [0.125]])
    for lvl, arr in enumerate(arrays):
        fine = arr[:, :, 0].T                          # [N, M]
        coarse = (arr[:, :, 1].T if arr.shape[2] > 1
                  else np.zeros_like(fine))
        storage.save_samples_bulk(lvl, list(range(arr.shape[1])),
                                  fine, coarse)
    root = make_root_quantity(storage, SPECS)
    return storage, root, arrays


# --------------------------------------------------------------------- #
# program generation: each step = (description, q-transform, oracle-transform)
# --------------------------------------------------------------------- #

class _Node:
    def __init__(self, q, evs, meta):
        self.q = q          # library Quantity
        self.evs = evs      # list per level of np [M', N_l, C_l]
        self.meta = meta    # oracle layout descriptor


def _apply_getitem(node, rng):
    kind = node.meta[0]
    if kind == "dict":
        names = [n for n, _ in node.meta[1]]
        name = names[rng.integers(len(names))]
        off = 0
        for n2, m2 in node.meta[1]:
            if n2 == name:
                child = m2
                break
            off += _meta_size(m2)
        sz = _meta_size(child)
        return ("[%r]" % name, _Node(
            node.q[name], [e[off:off + sz] for e in node.evs], child))
    if kind == "ts":
        times = node.meta[1]
        t = times[rng.integers(len(times))]
        child = node.meta[2]
        sz = _meta_size(child)
        off = times.index(t) * sz
        return ("[time=%r]" % t, _Node(
            node.q[t], [e[off:off + sz] for e in node.evs], child))
    if kind == "field":
        locs = node.meta[1]
        loc = locs[rng.integers(len(locs))]
        child = node.meta[2]
        sz = _meta_size(child)
        off = locs.index(loc) * sz
        return ("[%r]" % loc, _Node(
            node.q[loc], [e[off:off + sz] for e in node.evs], child))
    # array: random numpy key
    shape = node.meta[1]
    choice = rng.integers(3)
    if choice == 0:                       # one int index on axis 0
        key = int(rng.integers(shape[0]))
    elif choice == 1:                     # slice on axis 0
        lo = int(rng.integers(shape[0]))
        hi = int(rng.integers(lo + 1, shape[0] + 1))
        key = slice(lo, hi)
    else:                                 # full tuple of ints
        key = tuple(int(rng.integers(s)) for s in shape)

    def ora(e):
        shaped = e.reshape(tuple(shape) + e.shape[-2:])
        return _keep_dims(shaped[key])

    out_evs = [ora(e) for e in node.evs]
    # mirror ArrayType.get_key's probe: the result TYPE keeps the numpy
    # result shape ((1,) degrades to scalar), while the data path above
    # flattens leading dims — tracking the flat count instead diverged
    # on chained keys (slice then tuple indexes the ORIGINAL shape)
    probe_shape = np.empty(tuple(shape))[key].shape
    if probe_shape == (1,):
        probe_shape = ()
    new_meta = (("array", tuple(probe_shape)) if probe_shape
                else ("scalar",))
    return ("[%r]" % (key,), _Node(node.q[key], out_evs, new_meta))


_UFUNCS = [
    ("sin", np.sin), ("cos", np.cos), ("abs", np.abs),
    ("sqrt|x|+1", lambda x: np.sqrt(np.abs(x) + 1.0)),
]


def _apply_op(node, rng, arrays):
    """One random non-getitem algebra step.

    Structural typing mirrors the library exactly: ufuncs (numpy protocol
    -> ``_result_qtype`` probing) COLLAPSE the nested type to a flat
    ArrayType, while the arithmetic dunders preserve ``live[0].qtype``
    (quantity.py create_quantity) — so the oracle meta collapses on
    ufuncs and survives arithmetic.
    """
    flat = ("array", (_meta_size(node.meta),))
    c = rng.integers(6)
    if c == 0:
        name, f = _UFUNCS[rng.integers(len(_UFUNCS))]
        return (name, _Node(f(node.q), [f(e) for e in node.evs], flat))
    if c == 1:
        k = float(np.round(rng.uniform(-2, 2), 3)) or 1.0
        return ("*%s+1" % k, _Node(node.q * k + 1.0,
                                   [e * k + 1.0 for e in node.evs],
                                   node.meta))
    if c == 2:
        k = float(np.round(rng.uniform(0.5, 2.5), 3))
        return ("/%s" % k, _Node(node.q / k, [e / k for e in node.evs],
                                 node.meta))
    if c == 3:   # binary with a derived operand; dunder add keeps type
        return ("x+cos(x)*0.5", _Node(
            node.q + np.cos(node.q) * 0.5,
            [e + np.cos(e) * 0.5 for e in node.evs], node.meta))
    if c == 4:   # maximum against a constant (ufunc -> collapses)
        t = float(np.round(rng.uniform(-1, 3), 3))
        return ("max(x,%s)" % t, _Node(
            np.maximum(node.q, t), [np.maximum(e, t) for e in node.evs],
            flat))
    # mask or select on a comparison against a mid-range threshold
    finite = np.concatenate([e[np.isfinite(e)].ravel()
                             for e in node.evs])
    thresh = float(np.median(finite)) if finite.size else 0.0
    cond = node.q < thresh

    def keep_of(e):
        with np.errstate(invalid="ignore"):
            m = e < thresh
        # NaN comparisons are False -> poisoned rows never survive,
        # matching the library's jnp comparison semantics
        return m.all(axis=0).all(axis=-1)

    if rng.integers(2):
        new_q = node.q.mask(cond)

        def mask_e(e):
            keep = keep_of(e)
            return np.where(keep[None, :, None], e, np.nan)

        return ("mask(x<%.3g)" % thresh,
                _Node(new_q, [mask_e(e) for e in node.evs], node.meta))
    new_q = node.q.select(cond)
    return ("select(x<%.3g)" % thresh,
            _Node(new_q, [e[:, keep_of(e), :] for e in node.evs],
                  node.meta))


def _run_program(root, arrays, seed, max_ops=None):
    """Build one random program; return (ops trace, final node).

    ``max_ops`` truncates the SAME seeded op sequence (the rng draws are
    identical per step), which is what makes prefix-shrinking exact.
    """
    rng = np.random.default_rng(seed)
    node = _Node(root, [a.copy() for a in arrays], _root_meta())
    ops = []
    n_ops = int(rng.integers(2, 7))
    if max_ops is not None:
        n_ops = min(n_ops, max_ops)
    for _ in range(n_ops):
        structured = node.meta[0] in ("dict", "ts", "field")
        deep_array = (node.meta[0] == "array"
                      and _meta_size(node.meta) > 1 and rng.integers(2))
        if structured and (node.meta[0] == "dict" or rng.integers(3)):
            desc, node = _apply_getitem(node, rng)
        elif deep_array:
            desc, node = _apply_getitem(node, rng)
        elif node.meta[0] == "ts" and len(node.meta[1]) > 1 \
                and rng.integers(4) == 0:
            t0, tn = node.meta[1][0], node.meta[1][-1]
            t = float(np.round(rng.uniform(t0, tn), 3))
            times = np.asarray(node.meta[1], float)
            lo = int(np.clip(np.searchsorted(times, t) - 1, 0,
                             len(times) - 2))
            w = (t - times[lo]) / (times[lo + 1] - times[lo])
            sz = _meta_size(node.meta[2])

            def interp(e):
                s = e.reshape((len(times), sz) + e.shape[-2:])
                return (1.0 - w) * s[lo] + w * s[lo + 1]

            desc = "interp(t=%s)" % t
            node = _Node(node.q.time_interpolation(t),
                         [interp(e) for e in node.evs], node.meta[2])
        else:
            desc, node = _apply_op(node, rng, arrays)
        ops.append(desc)
    return ops, node


def _check_node(node):
    """Compare every level's chunk against the oracle; '' if OK."""
    for lvl in range(N_LEVELS):
        got = np.asarray(node.q.samples(ChunkSpec(level_id=lvl)))
        want = node.evs[lvl]
        if got.shape != want.shape:
            return "level %d shape %s != oracle %s" % (
                lvl, got.shape, want.shape)
        if not np.allclose(got, want, rtol=1e-10, atol=1e-10,
                           equal_nan=True):
            dev = np.nanmax(np.abs(got - want))
            return "level %d values deviate (max %g)" % (lvl, dev)
    return ""


@pytest.mark.parametrize(
    "seed_range",
    [range(0, 25), range(25, 70), range(70, 120), range(120, 170),
     range(170, 220)],
    ids=["seeds_0_24", "seeds_25_69", "seeds_70_119", "seeds_120_169",
         "seeds_170_219"])
def test_random_program_sweep(store_and_oracle, seed_range):
    """≥200 random algebra programs (five slices, each under the fast
    gate's 8 s budget — XLA's process-wide eager compile cache makes the
    split near-free), every chunk vs the numpy oracle; failures
    prefix-shrink to the shortest failing seeded op trace."""
    _storage, root, arrays = store_and_oracle
    failures = []
    for seed in seed_range:
        q_mod.cache_clear()
        ops, node = _run_program(root, arrays, seed)
        err = _check_node(node)
        if not err:
            continue
        # shrink: re-run the same seeded program capped at every prefix
        # length and report the SHORTEST failing op sequence
        short_ops, short_err = ops, err
        for cut in range(1, len(ops)):
            pops, pnode = _run_program(root, arrays, seed, max_ops=cut)
            perr = _check_node(pnode)
            if perr:
                short_ops, short_err = pops, perr
                break
        failures.append("seed=%d ops=%s -> %s" % (seed, short_ops,
                                                  short_err))
    assert not failures, "\n".join(failures[:10])


def test_estimate_mean_matches_oracle(store_and_oracle):
    """Full estimate_mean on a sample of the random programs: telescoped
    mean, per-level sample counts, and removed counts vs the oracle."""
    _storage, root, arrays = store_and_oracle
    checked = 0
    for seed in range(0, 220, 5):
        q_mod.cache_clear()
        qe.cache_clear()
        ops, node = _run_program(root, arrays, seed)
        if not isinstance(node.q.qtype.base_qtype(),
                          type(root.qtype.base_qtype())):
            continue
        valid_counts = []
        level_means = []
        ok = True
        for lvl in range(N_LEVELS):
            e = node.evs[lvl]
            valid = ~np.isnan(e).any(axis=(0, 2))
            if valid.sum() < 2:
                ok = False
                break
            d = e[:, :, 0] - e[:, :, 1] if e.shape[2] > 1 else e[:, :, 0]
            level_means.append(d[:, valid].mean(axis=1))
            valid_counts.append(int(valid.sum()))
        if not ok:
            continue
        m = qe.estimate_mean(node.q)
        got_mean = np.ravel(np.asarray(m.mean))
        want_mean = np.sum(level_means, axis=0)
        assert list(m.n_samples) == valid_counts, (seed, ops)
        assert np.allclose(got_mean, want_mean, rtol=1e-9, atol=1e-12), (
            seed, ops, got_mean, want_mean)
        checked += 1
    assert checked >= 20  # the sweep actually exercised estimates


def test_subsample_invariants(store_and_oracle):
    """subsample draws exactly k columns per level (single-chunk store),
    each an original column of its level."""
    _storage, root, arrays = store_and_oracle
    q = root["a"][1]["x"][0, 0]
    want_k = [20, 10, 5]
    sub = q.subsample(want_k)
    for lvl in range(N_LEVELS):
        q_mod.cache_clear()
        got = np.asarray(sub.samples(ChunkSpec(level_id=lvl)))
        orig = np.asarray(q.samples(ChunkSpec(level_id=lvl)))
        assert got.shape[1] == want_k[lvl]
        # every drawn column must literally be one of the original columns
        for j in range(got.shape[1]):
            matches = np.all(
                np.isclose(orig, got[:, j:j + 1, :], equal_nan=True),
                axis=(0, 2))
            assert matches.any(), (lvl, j)


def test_qtype_offset_roundtrip(store_and_oracle):
    """Offset invariant, directly: for every (name, time, location) path
    the library getitem chain lands exactly on the independently computed
    flat slab slice of the root payload."""
    _storage, root, arrays = store_and_oracle
    meta = _root_meta()
    off = 0
    for (name, spec) in [(s.name, s) for s in SPECS]:
        p = int(np.prod(spec.shape))
        for ti, t in enumerate(spec.times):
            for li, loc in enumerate(spec.locations):
                start = (off + ti * len(spec.locations) * p + li * p)
                sub = root[name][t][loc]
                for lvl in range(N_LEVELS):
                    q_mod.cache_clear()
                    got = np.asarray(sub.samples(ChunkSpec(level_id=lvl)))
                    want = arrays[lvl][start:start + p]
                    assert np.allclose(got, want, equal_nan=True), (
                        name, t, loc, lvl)
        off += p * len(spec.times) * len(spec.locations)
