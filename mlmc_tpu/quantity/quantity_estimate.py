"""MLMC estimators over Quantity DAGs — the read-side hot path.

Re-design of reference mlmc/quantity/quantity_estimate.py:6-156. Differences:

* NaN-sample masking keeps static shapes: invalid sample columns are zeroed
  and counted instead of removed (identical sums, jit-friendly),
* when the Quantity DAG is fully traceable, the per-chunk pipeline
  (DAG ops -> nan mask -> fine-coarse diff -> sum / sum-of-squares) is
  compiled ONCE per (level-kind, chunk-shape) and reused for every chunk —
  the moment Vandermonde and the reductions fuse into a single XLA kernel,
* accumulation across chunks happens in float64 when x64 is enabled
  (CPU tests / parity checks) and float32 with compensated ordering on TPU.

The one-pass telescoping estimator itself is unchanged:
    mean = sum_l mean(fine_l - coarse_l),  var = sum_l var_l / n_l
(reference quantity_estimate.py:43-80).
"""
import numpy as np
import jax
import jax.numpy as jnp

import mlmc_tpu.quantity.quantity as q_mod
import mlmc_tpu.quantity.quantity_types as qt


def mask_nan_samples(chunk):
    """Drop samples containing NaN in fine or coarse part (eager helper).

    :param chunk: array [M, N, 2]
    :return: (chunk without masked samples, number masked)
    """
    chunk = np.asarray(chunk)
    mask = np.any(np.isnan(chunk), axis=0).any(axis=1)
    return chunk[..., ~mask, :], int(np.count_nonzero(mask))


def cache_clear():
    q_mod.cache_clear()


def _accum_dtype():
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def _chunk_sums_impl(chunk, n_true=None):
    """Per-chunk masked accumulation: (sum, sum_sq, n_valid).

    chunk: [M, N, C] with C==1 (level 0) or C==2. NaN-poisoned samples are
    zeroed out and counted, matching the drop-then-sum semantics of the
    reference (quantity_estimate.py:45-65). ``n_true`` (traced) marks the
    true sample count of a padded chunk: pad columns are EXCLUDED by
    position, never by NaN detection — a DAG with non-NaN-propagating ops
    (fmax, power(x, 0), ...) would otherwise launder pad columns into
    phantom valid samples.
    """
    chunk = jnp.asarray(chunk)
    if not jnp.issubdtype(chunk.dtype, jnp.floating):
        raise TypeError("estimate_mean requires float-valued quantities")
    acc = _accum_dtype()
    valid = ~jnp.any(jnp.isnan(chunk), axis=(0, 2))  # [N]
    if n_true is not None:
        valid &= jnp.arange(chunk.shape[1]) < n_true
    if chunk.shape[2] == 1:
        diff = chunk[:, :, 0]
    else:
        diff = chunk[:, :, 0] - chunk[:, :, 1]
    diff = jnp.where(valid[None, :], diff, 0.0).astype(acc)
    s = jnp.sum(diff, axis=1)
    sp = jnp.sum(diff * diff, axis=1)
    return s, sp, jnp.sum(valid)


_chunk_sums = jax.jit(_chunk_sums_impl)


def estimate_mean(quantity):
    """MLMC mean estimator (streaming over chunks, device accumulation).

    When the quantity's DAG is fully traceable (shape-static jnp ops), the
    WHOLE per-chunk pipeline — DAG evaluation, NaN mask, fine-coarse diff,
    sum / sum-of-squares — is composed via ``Quantity.build_eval`` and
    compiled ONCE per chunk shape, so XLA fuses the moment Vandermonde and
    the reductions into a single program per chunk instead of dispatching
    each DAG node separately.

    :param quantity: Quantity
    :return: QuantityMean holding per-level means/vars and combined estimate
    """
    cache_clear()
    quantity_vec_size = quantity.size()
    quantity_storage = quantity.get_quantity_storage()
    level_ids = quantity_storage.level_ids()
    n_levels = int(np.max(level_ids)) + 1

    n_samples = [0] * n_levels
    n_rm_samples = [0] * n_levels

    fused_eval = None
    # fusing the whole DAG costs one XLA compile per (DAG, chunk shape);
    # worth it for real sample volumes, not for tiny interactive queries
    try:
        n_collected = max(quantity_storage.n_collected())
    except Exception:
        n_collected = 0
    if quantity.traceable() and n_collected >= 8192:
        # cache the jitted composition on the node: repeated estimates over
        # the same DAG reuse the executable (jit caches per function object)
        fused_eval = getattr(quantity, "_fused_eval", None)
        if fused_eval is None:
            dag_eval = quantity.build_eval()
            fused_eval = jax.jit(
                lambda leaf, n_true: _chunk_sums_impl(dag_eval(leaf), n_true))
            quantity._fused_eval = fused_eval

    sums = [np.zeros(quantity_vec_size, dtype=np.float64)
            for _ in range(n_levels)]
    sums_of_squares = [np.zeros(quantity_vec_size, dtype=np.float64)
                       for _ in range(n_levels)]
    for chunk_spec in quantity_storage.chunks():
        if fused_eval is not None:
            leaf = jnp.asarray(quantity_storage.samples(chunk_spec))
            if not jnp.issubdtype(leaf.dtype, jnp.floating):
                # the eager path type-checks the DAG OUTPUT; match it by
                # lifting an integer leaf to float before evaluation
                leaf = leaf.astype(_accum_dtype())
            # pad the sample axis to a power-of-two bucket: growing storage
            # (adaptive rounds) then reuses the compiled executable instead
            # of recompiling per new chunk length (10-30 s per compile on a
            # remote-attached chip). Pad columns are excluded by POSITION
            # inside the kernel (n_true is a traced argument).
            n_true = leaf.shape[1]
            bucket = 1 << max(int(n_true - 1).bit_length(), 10)
            pad = bucket - n_true
            if pad:
                leaf = jnp.pad(leaf, ((0, 0), (0, pad), (0, 0)),
                               constant_values=jnp.nan)
            s, sp, n_valid = fused_eval(leaf, n_true)
        else:
            samples = jnp.asarray(quantity.samples(chunk_spec))
            if not jnp.issubdtype(samples.dtype, jnp.floating):
                raise TypeError(
                    "estimate_mean supports float-valued quantities, "
                    "got dtype {}".format(samples.dtype))
            assert samples.shape[0] == quantity_vec_size
            n_true = samples.shape[1]
            s, sp, n_valid = _chunk_sums(samples)

        lid = chunk_spec.level_id
        n_valid = int(n_valid)
        n_samples[lid] += n_valid
        n_rm_samples[lid] += n_true - n_valid
        sums[lid] += np.asarray(s, dtype=np.float64)
        sums_of_squares[lid] += np.asarray(sp, dtype=np.float64)

    if sum(n_samples) == 0:
        raise Exception("All samples were masked")

    l_means = []
    l_vars = []
    for s, sp, n in zip(sums, sums_of_squares, n_samples):
        if n == 0:
            l_means.append(np.zeros(len(s)))
            l_vars.append(np.full(len(s), np.inf))
            continue
        l_means.append(s / n)
        if n > 1:
            l_vars.append((sp - (s ** 2 / n)) / (n - 1))
        else:
            l_vars.append(np.full(len(s), np.inf))

    return q_mod.QuantityMean(
        quantity.qtype,
        l_means=l_means,
        l_vars=l_vars,
        n_samples=n_samples,
        n_rm_samples=n_rm_samples,
    )


def moment(quantity, moments_fn, i=0):
    """Quantity evaluating the i-th moment function (reference :83-93)."""

    def eval_moment(x):
        return moments_fn.eval_single_moment(i, value=jnp.asarray(x))

    return q_mod.Quantity(
        quantity_type=quantity.qtype, input_quantities=[quantity], operation=eval_moment
    )


def moments(quantity, moments_fn, mom_at_bottom=True):
    """Quantity evaluating all R moment functions (reference :96-119).

    Each scalar of the quantity becomes an array of R moment values; the
    Vandermonde evaluation is a traced jnp op so it fuses with the
    downstream sums under the jitted estimator path.
    """

    def eval_moments(x):
        x = jnp.asarray(x)
        mom = moments_fn.eval_all(x)  # [M, N, 2, R]
        if mom_at_bottom:
            mom = jnp.transpose(mom, (0, 3, 1, 2))  # [M, R, N, 2]
        else:
            mom = jnp.transpose(mom, (3, 0, 1, 2))  # [R, M, N, 2]
        return mom.reshape((int(np.prod(mom.shape[:-2])),) + mom.shape[-2:])

    if mom_at_bottom:
        moments_array_type = qt.ArrayType(shape=(moments_fn.size,), qtype=qt.ScalarType())
        moments_qtype = quantity.qtype.replace_scalar(moments_array_type)
    else:
        moments_qtype = qt.ArrayType(shape=(moments_fn.size,), qtype=quantity.qtype)
    return q_mod.Quantity(
        quantity_type=moments_qtype, input_quantities=[quantity], operation=eval_moments
    )


def covariance(quantity, moments_fn, cov_at_bottom=True):
    """Quantity evaluating the R x R moment outer products (reference :122-156)."""

    def eval_cov(x):
        x = jnp.asarray(x)
        mom = moments_fn.eval_all(x)  # [M, N, 2, R]
        mom_fine = mom[..., 0, :]
        cov_fine = mom_fine[..., :, None] * mom_fine[..., None, :]
        if mom.shape[-2] == 1:
            cov = cov_fine[None, ...]  # [1, M, N, R, R]
        else:
            mom_coarse = mom[..., 1, :]
            cov_coarse = mom_coarse[..., :, None] * mom_coarse[..., None, :]
            cov = jnp.stack([cov_fine, cov_coarse], axis=0)  # [2, M, N, R, R]
        if cov_at_bottom:
            cov = jnp.transpose(cov, (1, 3, 4, 2, 0))  # [M, R, R, N, 2]
        else:
            cov = jnp.transpose(cov, (3, 4, 1, 2, 0))  # [R, R, M, N, 2]
        return cov.reshape((int(np.prod(cov.shape[:-2])),) + cov.shape[-2:])

    if cov_at_bottom:
        moments_array_type = qt.ArrayType(
            shape=(moments_fn.size, moments_fn.size), qtype=qt.ScalarType()
        )
        moments_qtype = quantity.qtype.replace_scalar(moments_array_type)
    else:
        moments_qtype = qt.ArrayType(shape=(moments_fn.size, moments_fn.size), qtype=quantity.qtype)
    return q_mod.Quantity(
        quantity_type=moments_qtype, input_quantities=[quantity], operation=eval_cov
    )
