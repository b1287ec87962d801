"""Fused sample->moment estimation pipeline — the TPU hot path.

The reference's read-side hot loop (reference mlmc/quantity/quantity_estimate.py:43-65)
streams stored samples from HDF5 through a numpy Vandermonde and accumulates
per-level sums. For pure moment/covariance workloads the TPU inversion goes
further: samples are never materialized at all. One jitted program per level

    keys --vmap(simulate)--> (fine, coarse)            [C]
         --legvander------> (phi_f, phi_c)             [C, R]
         --diff/mask------> dphi                       [C, R]
         --reduce---------> sums [R], sums2 [R]        (VPU)
         --phi^T phi------> cov_f, cov_c [R, R]        (MXU matmul)

runs under ``lax.fori_loop`` over chunks with accumulators resident in
registers/VMEM, so HBM traffic is O(R^2) per chunk instead of O(C*M).
10^8 samples stream through a single executable invocation.

Accumulation precision: within a chunk partial sums are computed in the
compute dtype (f32 on TPU); the cross-chunk running accumulators are kept in
float64 (tiny [R]/[R,R] adds), which bounds the accumulation error by the
within-chunk error ~ sqrt(chunk)*eps_f32 independent of total N. With x64
enabled (CPU parity tests) everything is f64 end-to-end.

Sharding: ``fused_mlmc_moments`` accepts an optional mesh axis name; the
chunk loop then runs data-parallel over the ``samples`` axis and the final
accumulators are reduced with ``psum`` — the entire MLMC communication
pattern (SURVEY.md §2 parallelism checklist).
"""
import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class MomentAccumulators(NamedTuple):
    """Per-level streaming state (parity: reference quantity_estimate.py:64-77)."""

    sums: jax.Array          # [R] sum of (phi_f - phi_c) over valid samples
    sums2: jax.Array         # [R] sum of squares of the diff
    cov_fine: jax.Array      # [R, R] sum of phi_f phi_f^T
    cov_coarse: jax.Array    # [R, R] sum of phi_c phi_c^T
    n_valid: jax.Array       # [] valid-sample count
    n_total: jax.Array       # [] processed-sample count


def _moment_chunk(phi_f, phi_c, valid, acc_dtype):
    """One chunk's contributions. phi_*: [C, ..., R] (scalar QoI: [C, R];
    M-component QoI: [C, M, R]); valid: [C] bool (a sample is dropped as a
    whole if ANY component is invalid — reference mask_nan semantics,
    quantity_estimate.py:6-14)."""
    vf = valid.reshape(valid.shape + (1,) * (phi_f.ndim - 1))
    phi_f = jnp.where(vf, phi_f, 0.0)
    phi_c = jnp.where(vf, phi_c, 0.0)
    dphi = phi_f - phi_c
    sums = jnp.sum(dphi, axis=0).astype(acc_dtype)
    sums2 = jnp.sum(dphi * dphi, axis=0).astype(acc_dtype)
    # accumulate matmuls at least in f32 (TPU MXU); full acc_dtype when f64
    # parity runs are requested (x64 mode)
    pet = acc_dtype if jnp.dtype(acc_dtype).itemsize > 4 else jnp.float32
    cov_f = jnp.einsum("c...r,c...s->...rs", phi_f, phi_f,
                       preferred_element_type=pet).astype(acc_dtype)
    cov_c = jnp.einsum("c...r,c...s->...rs", phi_c, phi_c,
                       preferred_element_type=pet).astype(acc_dtype)
    n_valid = jnp.sum(valid).astype(acc_dtype)
    return sums, sums2, cov_f, cov_c, n_valid


def fused_level_moments(
    sample_chunk_fn,
    moments_fn,
    level_key,
    n_samples,
    chunk_size: int,
    *,
    is_level0: bool,
    acc_dtype=jnp.float64,
    axis_name: Optional[str] = None,
    start_index=0,
    n_alloc: Optional[int] = None,
):
    """Stream one level's samples through the fused moment pipeline.

    :param sample_chunk_fn: ``f(keys [C]) -> (fine, coarse, failed [C])``
        pure jnp batch simulation; fine/coarse are [C] for a scalar QoI or
        [C, M] for an M-component (vector / time-series) QoI — the QoI
        shape is probed via ``jax.eval_shape`` and the accumulators become
        [M, R] / [M, R, R] (reference treats M>1 as the normal case,
        quantity_estimate.py:105-110)
    :param moments_fn: moment basis (Moments instance)
    :param level_key: PRNG key for this level
    :param n_samples: total samples to draw on this level (static)
    :param chunk_size: samples per fori_loop step (static)
    :param is_level0: True -> coarse contributions are zero
    :param acc_dtype: cross-chunk accumulator dtype
    :param axis_name: mesh axis to psum accumulators over (None = single chip)
    :param start_index: first sample index (for reproducible continuation);
        may be a traced value
    :param n_alloc: static upper bound on n_samples (sets the loop bound so
        one executable serves any smaller dynamic n_samples); defaults to
        n_samples, which must then be a static int
    :return: MomentAccumulators (already psum-reduced if axis_name given)

    Sample seeds mirror the pool scheme: ``fold_in(level_key, sample_index)``
    so the same (level, index) always produces the same draw, on any chip or
    mesh layout (reference md5(sample_id) scheme, sampling_pool.py:75-84).
    Indices are uint32: a level's stream supports up to 2^32 samples.
    """
    R = moments_fn.size
    if n_alloc is None:
        n_alloc = int(n_samples)
    n_chunks = -(-n_alloc // chunk_size)
    # probe the QoI trailing shape (scalar () or vector (M,)) without tracing
    key_struct = jax.eval_shape(lambda: jax.random.split(
        jax.random.key(0), chunk_size))
    fine_struct = jax.eval_shape(sample_chunk_fn, key_struct)[0]
    qoi_shape = tuple(fine_struct.shape[1:])
    n_samples = jnp.asarray(n_samples, dtype=jnp.uint32)
    start_index = jnp.asarray(start_index, dtype=jnp.uint32)

    if axis_name is not None:
        shard_ix = jax.lax.axis_index(axis_name)
        n_shards = jax.lax.axis_size(axis_name)
    else:
        shard_ix = 0
        n_shards = 1

    def body(i, acc_comp):
        # global chunk index = i * n_shards + shard (stride layout keeps the
        # per-index key mapping identical regardless of mesh size)
        chunk_ix = i * n_shards + shard_ix
        base = start_index + (chunk_ix * chunk_size).astype(jnp.uint32)
        idx = base + jnp.arange(chunk_size, dtype=jnp.uint32)
        in_range = idx < (start_index + n_samples)
        # entire chunk out of range still executes (static loop bound);
        # its contributions are masked to zero below
        keys = jax.vmap(lambda j: jax.random.fold_in(level_key, j))(idx)
        fine, coarse, failed = sample_chunk_fn(keys)
        comp_axes = tuple(range(1, fine.ndim))  # QoI component axes, if any
        valid = (in_range & ~failed
                 & ~jnp.any(jnp.isnan(fine), axis=comp_axes))
        if not is_level0:
            # level 0's coarse output is ignored entirely, so a NaN there
            # (a natural 'no coarse' marker) must not invalidate the sample
            valid = valid & ~jnp.any(jnp.isnan(coarse), axis=comp_axes)

        phi_f = moments_fn.eval_all(fine)       # [C, ..., R]
        if is_level0:
            phi_c = jnp.zeros_like(phi_f)
        else:
            phi_c = moments_fn.eval_all(coarse)
        # moment-domain clipping produces NaN lanes -> invalid sample
        phi_axes = tuple(range(1, phi_f.ndim))
        valid = valid & ~jnp.any(jnp.isnan(phi_f), axis=phi_axes)
        if not is_level0:
            valid = valid & ~jnp.any(jnp.isnan(phi_c), axis=phi_axes)
        phi_f = jnp.nan_to_num(phi_f)
        phi_c = jnp.nan_to_num(phi_c)

        acc, comp = acc_comp
        s, s2, cf, cc, nv = _moment_chunk(phi_f, phi_c, valid, acc.sums.dtype)

        def kadd(a, c, delta):
            # Kahan step: cross-chunk error stays at one rounding of the
            # final value (the f32 tier's documented 'compensated ordering')
            y = delta - c
            t = a + y
            return t, (t - a) - y

        sums, c_sums = kadd(acc.sums, comp.sums, s)
        sums2, c_sums2 = kadd(acc.sums2, comp.sums2, s2)
        cov_f, c_cov_f = kadd(acc.cov_fine, comp.cov_fine, cf)
        cov_c, c_cov_c = kadd(acc.cov_coarse, comp.cov_coarse, cc)
        new_acc = MomentAccumulators(
            sums=sums, sums2=sums2, cov_fine=cov_f, cov_coarse=cov_c,
            n_valid=acc.n_valid + nv,
            n_total=acc.n_total + jnp.sum(in_range).astype(acc.sums.dtype),
        )
        new_comp = MomentAccumulators(
            sums=c_sums, sums2=c_sums2, cov_fine=c_cov_f, cov_coarse=c_cov_c,
            n_valid=comp.n_valid, n_total=comp.n_total,
        )
        return new_acc, new_comp

    # shards process interleaved chunks; ceil so every chunk is covered
    n_local_chunks = -(-n_chunks // n_shards)
    # dynamic trip count: run only the chunks the TRACED count needs, so
    # one executable (compiled at the static n_alloc bound) serves any
    # smaller count with NO masked-chunk waste — the static bound stays a
    # clamp. The first all-masked chunk used to fold the running Kahan
    # compensation into the accumulator (delta=0 -> t = a - c, c -> 0);
    # the explicit fold below reproduces that exactly.
    # overflow-safe ceil-divs in uint32 (n_samples may approach 2^32;
    # adding chunk_size-1 before dividing, or an int32 cast, would wrap)
    cs = jnp.uint32(chunk_size)
    needed = n_samples // cs + (n_samples % cs != 0).astype(jnp.uint32)
    sh = jnp.uint32(n_shards)
    needed = needed // sh + (needed % sh != 0).astype(jnp.uint32)
    trip = jnp.minimum(jnp.uint32(n_local_chunks), needed).astype(jnp.int32)
    init = MomentAccumulators(
        sums=jnp.zeros(qoi_shape + (R,), acc_dtype),
        sums2=jnp.zeros(qoi_shape + (R,), acc_dtype),
        cov_fine=jnp.zeros(qoi_shape + (R, R), acc_dtype),
        cov_coarse=jnp.zeros(qoi_shape + (R, R), acc_dtype),
        n_valid=jnp.zeros((), acc_dtype),
        n_total=jnp.zeros((), acc_dtype),
    )
    acc, comp = jax.lax.fori_loop(0, trip, body, (init, init))
    # fold the residual compensation (true total ~ a - c); with the old
    # static bound the first padded all-masked chunk did this in-loop
    acc = MomentAccumulators(
        sums=acc.sums - comp.sums, sums2=acc.sums2 - comp.sums2,
        cov_fine=acc.cov_fine - comp.cov_fine,
        cov_coarse=acc.cov_coarse - comp.cov_coarse,
        n_valid=acc.n_valid, n_total=acc.n_total)
    if axis_name is not None:
        acc = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), acc)
    return acc


def accumulators_to_estimates(accs):
    """Combine per-level accumulators into MLMC estimates (host, numpy).

    :param accs: list of MomentAccumulators (one per level)
    :return: dict with l_means [L, R], l_vars [L, R], mean [R], var [R],
        cov [R, R] (telescoped fine-coarse), n_samples [L]
    """
    l_means, l_vars, ns, covs = [], [], [], []
    for lvl, a in enumerate(accs):
        s = np.asarray(a.sums, dtype=np.float64)
        s2 = np.asarray(a.sums2, dtype=np.float64)
        n = float(a.n_valid)
        ns.append(n)
        # explicit degenerate-count semantics (match quantity_estimate):
        # n == 0 -> zero mean / infinite variance, n == 1 -> infinite var
        safe_n = max(n, 1.0)
        mean = s / safe_n
        var = ((s2 - s * s / safe_n) / (n - 1) if n > 1
               else np.full_like(s, np.inf))
        if n == 0:
            mean = np.zeros_like(s)
        l_means.append(mean)
        l_vars.append(var)
        cf = np.asarray(a.cov_fine, dtype=np.float64) / safe_n
        cc = np.asarray(a.cov_coarse, dtype=np.float64) / safe_n
        covs.append(cf - cc if lvl > 0 else cf)
    l_means = np.stack(l_means)
    l_vars = np.stack(l_vars)
    ns = np.asarray(ns)
    return dict(
        l_means=l_means,
        l_vars=l_vars,
        mean=l_means.sum(axis=0),
        var=(l_vars / np.maximum(ns, 1.0)[:, None]).sum(axis=0),
        cov=np.sum(covs, axis=0),
        n_samples=ns,
    )


def fused_mlmc_moments(
    sim_chunk_fns,
    moments_fn,
    root_key,
    n_samples_per_level,
    chunk_size: int = 32768,
    acc_dtype=None,
    axis_name: Optional[str] = None,
):
    """All levels of the fused pipeline in ONE traced program.

    :param sim_chunk_fns: per-level ``f(keys) -> (fine, coarse, failed)``
    :param n_samples_per_level: static per-level counts (list of int)
    :return: list of MomentAccumulators, one per level

    Jit this (optionally inside ``shard_map`` over a ``samples`` axis) to get
    the whole telescoped estimate as a single executable.
    """
    if acc_dtype is None:
        acc_dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    accs = []
    for lvl, (fn, n) in enumerate(zip(sim_chunk_fns, n_samples_per_level)):
        level_key = jax.random.fold_in(root_key, lvl)
        accs.append(
            fused_level_moments(
                fn,
                moments_fn,
                level_key,
                int(n),
                min(chunk_size, max(int(n), 1)),
                is_level0=(lvl == 0),
                acc_dtype=acc_dtype,
                axis_name=axis_name,
            )
        )
    return accs
