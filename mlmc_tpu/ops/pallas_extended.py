"""Extended-precision (double-float) Pallas estimation tier.

Closes the SURVEY §6 north star ("matching reference estimates to 1e-10")
on f32 TPU hardware. The f32+Kahan fast tier bottoms out at the
within-chunk f32 reduction floor (~5e-7 relative at 1e8 samples,
BENCH_r02). Worse, bit-level f32 value parity with a host reference is
unattainable in principle: both XLA:CPU (LLVM) and Mosaic contract
``a*b - c`` into FMAs, so compiled f32 basis values differ from numpy's at
eps32 per sample. This tier therefore computes BOTH the basis values and
the accumulation in DOUBLE-FLOAT — an unevaluated pair of f32s carrying
~49 significant bits — tracking the reference's own all-f64 numpy pipeline
(reference mlmc/quantity/quantity_estimate.py:64-77 over f64 Legendre
values, mlmc/moments.py:195-197) on identical f32 QoI inputs:

* transform      t = (x - shift)*scale as df ops with df-split constants
* recurrence     Legendre/Monomial rows in df arithmetic (two_prod via
                 Dekker splits; see ops/df64.py on compiler contraction
                 and the raw-vs-snapped EFT flavors)
* reductions     pairwise-halving lane folds with df adds
* cross-chunk    sequential df accumulation into paired (hi, lo) blocks

Derived deterministic bound (ops/precision.py:df_error_bound):
|kernel - all_f64_ref| <= C * 2^-48 * S_abs with C ~ (basis-depth +
2 log2 chunk + 3 n_chunks) — about 1.3e-10 * S_abs at 1e8 samples and
measured ~1e-12 (the bound is worst-case sequential; real errors are
random-sign).

The covariance rides the MXU with an 8-bit fixed-point split of the df
head: ph = h + l, h = round(256*ph)/256 (|phi| <= 1 for the supported
bases, h exact in bf16). Per 128-lane segment dot(h, h^T) in bf16 is
EXACT in its f32 accumulator (products are multiples of 2^-16, partial
sums < 2^8); the h.l cross terms, l.l tail, and the df-lo cross terms ride
as plain f32 dots (magnitudes <= 2^-9 / 2^-24 keep their rounding
~1e-10 relative); segment results df-accumulate.

Supported bases: legendre, monomial, fourier. Fourier's transcendentals
have no error-free f32 transform, but df arithmetic does not need one:
the seed sin/cos come from a range-reduced df Taylor evaluation
(ops/df64.df_sincos, ~1e-14 absolute on [0, 2pi]) and the higher modes
from the angle-addition recurrence in df ops.

Opt-in tier: ~6-10x the VPU work of the fast tier — use it for final
estimates, not inside the adaptive loop.
"""
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlmc_tpu.ops.pallas_kernels import R_PAD

#: lane width of the double-float accumulator blocks
_LANES = 128
#: covariance segment length: bf16 h.h^T partial sums stay exact while
#: seg * 2^16 <= 2^24 (products are multiples of 2^-16, |sums| < 2^8)
_COV_SEG = 128


class ExtendedMomentResult(NamedTuple):
    """Host-side combined (f64) accumulators; fields mirror the fast
    tier's SynthMomentResult."""
    sums: np.ndarray        # [R] f64
    sums2: np.ndarray       # [R] f64
    cov_fine: np.ndarray    # [R, R] f64
    cov_coarse: np.ndarray  # [R, R] f64
    n_valid: int


# ------------------------------------------------------------------ #
# error-free transformations shared with the maxent solver (ops/df64.py)
# ------------------------------------------------------------------ #
from mlmc_tpu.ops import df64 as _df64  # noqa: E402

_df_const = _df64.df_const
#: Mosaic-compiled kernel bodies use the raw EFT flavor (reduce_precision
#: has no Mosaic lowering and the raw kernels are hardware-validated);
#: interpret mode compiles through XLA:CPU, whose fusion rematerialization
#: + FMA contraction breaks raw EFTs (see ops/df64.py) -> snapped flavor.
def _eft_for(interpret):
    return _df64._default if interpret else _df64.raw


def _df_reduce_lanes(hi, lo, width, eft):
    """Pairwise-halving lane reduction down to ``_LANES`` lanes; every
    fold is a df add."""
    while width > _LANES:
        half = width // 2
        hi, lo = eft.df_add(hi[:, :half], lo[:, :half],
                            hi[:, half:], lo[:, half:])
        width = half
    return hi, lo


def _round8(x):
    """round(256*x)/256 — snap to the 8-bit fixed-point grid (the round
    primitive survives XLA's algebraic simplifier; the classic add-big
    trick is folded away)."""
    return jnp.round(x * 256.0) * jnp.float32(1.0 / 256.0)


# ------------------------------------------------------------------ #
# df basis rows
# ------------------------------------------------------------------ #
def _df_basis_rows(phi_hi, phi_lo, t_hi, t_lo, valid, vf, n_moments,
                   basis, eft):
    """Write df basis rows into the [R_PAD, chunk] (hi, lo) scratch pair.

    Row semantics mirror pallas_kernels._basis_rows: row 0 carries the
    validity mask, invalid columns propagate exact zeros. Values track the
    f64 recurrence of reference mlmc/moments.py:126,197 to ~2^-48.
    """
    t_hi = jnp.where(valid, t_hi, 0.0)
    t_lo = jnp.where(valid, t_lo, 0.0)
    zero = jnp.zeros_like(t_hi[0])
    phi_hi[0, :] = vf[0]
    phi_lo[0, :] = zero
    if basis == "legendre":
        if n_moments > 1:
            phi_hi[1, :] = t_hi[0]
            phi_lo[1, :] = t_lo[0]
        p2 = (vf[0], zero)
        p1 = (t_hi[0], t_lo[0])
        for n in range(2, n_moments):
            a = eft.df_mul(t_hi[0], t_lo[0], *p1)
            a = eft.df_mul_f32(*a, jnp.float32(2 * n - 1))
            b = eft.df_mul_f32(*p2, jnp.float32(n - 1))
            num = eft.df_add(*a, *eft.df_neg(*b))
            cur = eft.df_div_f32(*num, jnp.float32(n))
            phi_hi[n, :] = cur[0]
            phi_lo[n, :] = cur[1]
            p2, p1 = p1, cur
    elif basis == "monomial":
        power = (vf[0], zero)
        for n in range(1, n_moments):
            power = eft.df_mul(*power, t_hi[0], t_lo[0])
            phi_hi[n, :] = power[0]
            phi_lo[n, :] = power[1]
    elif basis == "fourier":
        # df seed sin/cos (range-reduced Taylor, ops/df64.df_sincos:
        # ~1e-14 absolute on [0, 2pi]) + angle-addition recurrence in df,
        # mirroring the fast tier's row order (pallas_kernels._basis_rows).
        # Invalid columns: t is zeroed above, so cos would be 1 — mask the
        # SEED by vf and every recurrence product propagates the zero.
        (s_h, s_l), (c_h, c_l) = _df64.df_sincos(t_hi[0], t_lo[0], eft)
        c1 = (c_h * vf[0], c_l * vf[0])
        s1 = (s_h * vf[0], s_l * vf[0])
        ck, sk = c1, s1
        for i in range(1, n_moments):
            if i % 2 == 1:
                phi_hi[i, :] = ck[0]
                phi_lo[i, :] = ck[1]
            else:
                phi_hi[i, :] = sk[0]
                phi_lo[i, :] = sk[1]
                new_c = eft.df_add(*eft.df_mul(*ck, *c1),
                                   *eft.df_neg(*eft.df_mul(*sk, *s1)))
                new_s = eft.df_add(*eft.df_mul(*sk, *c1), *eft.df_mul(*ck, *s1))
                ck, sk = new_c, new_s
    else:
        raise ValueError("unknown basis %r" % (basis,))
    for n in range(n_moments, R_PAD):
        phi_hi[n, :] = zero
        phi_lo[n, :] = zero


# ------------------------------------------------------------------ #
# kernel body
# ------------------------------------------------------------------ #
def _df_accumulate_terms(t_hi, t_lo, acc_hi, acc_lo, chunk, eft):
    """Lane-reduce df terms and fold into [R_PAD, _LANES] df accumulators."""
    r_hi, r_lo = _df_reduce_lanes(t_hi, t_lo, chunk, eft)
    n_hi, n_lo = eft.df_add(acc_hi[...], acc_lo[...], r_hi, r_lo)
    acc_hi[...] = n_hi
    acc_lo[...] = n_lo


def _df_accumulate_cov(p_hi, p_lo, cov_hi, cov_lo, chunk, eft):
    """Segmented split-precision phi @ phi^T into df accumulators.

    p_hi = h + l with h on the 8-bit grid: dot(h, h^T) in bf16 is exact
    per 128-lane segment; h.l / l.h / l.l and the df-lo cross terms ride
    as plain f32 dots (all magnitudes <= 2^-9)."""
    h = _round8(p_hi)
    l = p_hi - h
    hb = h.astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))

    def dot(a, b):
        # f32 operands MUST request HIGHEST: the MXU's default single
        # bf16 pass truncates them to 8 mantissa bits (measured 9e-8
        # relative cov error on v5e vs the multi-pass decomposition).
        # bf16 operands (the exact h.h^T) must NOT: Mosaic rejects bf16
        # lhs with fp32 contract precision ("Bad lhs type"), and the
        # single pass is already exact for them.
        f32_operands = a.dtype == jnp.float32
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if f32_operands
                       else jax.lax.Precision.DEFAULT))

    for start in range(0, chunk, _COV_SEG):
        sl = slice(start, start + _COV_SEG)
        hs, hf, ls, plo = hb[:, sl], h[:, sl], l[:, sl], p_lo[:, sl]
        seg_exact = dot(hs, hs)
        # (h+l+plo)(h+l+plo)^T - h h^T, dropping plo.plo^T (~2^-50) and
        # folding l+plo into one small-magnitude factor
        small = ls + plo
        seg_cross = dot(hf, small)
        seg_crossT = dot(small, hf)
        seg_ll = dot(small, small)
        hi, lo = cov_hi[...], cov_lo[...]
        hi, lo = eft.df_add(hi, lo, seg_exact, jnp.zeros_like(seg_exact))
        hi, lo = eft.df_add(hi, lo, seg_cross + seg_crossT, seg_ll)
        cov_hi[...] = hi
        cov_lo[...] = lo


def _accumulate_qoi_chunk_ext(fine, coarse, i, refs, scratch, *,
                              n_moments, chunk, scale_df, shift_df,
                              offset_df, n_total, eft, ref_lo=-1.0,
                              ref_hi=1.0, basis="legendre",
                              is_level0=False):
    """df analogue of pallas_kernels._accumulate_qoi_chunk: the transform,
    basis rows, terms, and accumulation all run in double-float."""
    (sums_hi, sums_lo, sums2_hi, sums2_lo,
     covf_hi, covf_lo, covc_hi, covc_lo, n_valid_ref) = refs
    pf_hi, pf_lo, pc_hi, pc_lo = scratch

    def transform(x):
        # t = (x - shift) * scale + offset with df-split f64 constants
        d = eft.two_sum(x, jnp.float32(-shift_df[0]))
        d = (d[0], d[1] + jnp.float32(-shift_df[1]))
        t = eft.df_mul(*d, jnp.float32(scale_df[0]), jnp.float32(scale_df[1]))
        return eft.df_add(*t, jnp.float32(offset_df[0]),
                          jnp.float32(offset_df[1]))

    tf_hi, tf_lo = transform(fine)
    tc_hi, tc_lo = transform(coarse)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    in_range = (i * chunk + lane) < n_total
    valid = (tf_hi >= ref_lo) & (tf_hi <= ref_hi) & in_range
    if not is_level0:
        valid = valid & (tc_hi >= ref_lo) & (tc_hi <= ref_hi)
    vf = valid.astype(jnp.float32)

    _df_basis_rows(pf_hi, pf_lo, tf_hi, tf_lo, valid, vf, n_moments,
                   basis, eft)
    fh, fl = pf_hi[...], pf_lo[...]
    _df_accumulate_cov(fh, fl, covf_hi, covf_lo, chunk, eft)
    if is_level0:
        d_hi, d_lo = fh, fl
    else:
        _df_basis_rows(pc_hi, pc_lo, tc_hi, tc_lo, valid, vf, n_moments,
                       basis, eft)
        ch, cl = pc_hi[...], pc_lo[...]
        _df_accumulate_cov(ch, cl, covc_hi, covc_lo, chunk, eft)
        d_hi, d_lo = eft.df_add(fh, fl, -ch, -cl)
    _df_accumulate_terms(d_hi, d_lo, sums_hi, sums_lo, chunk, eft)
    sq = eft.df_mul(d_hi, d_lo, d_hi, d_lo)
    _df_accumulate_terms(*sq, sums2_hi, sums2_lo, chunk, eft)
    n_valid_ref[0, 0] += jnp.sum(vf).astype(jnp.int32)


def _samples_kernel_ext(ntot_ref, fine_ref, coarse_ref, *refs_and_scratch,
                        **params):
    refs, scratch = refs_and_scratch[:9], refs_and_scratch[9:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        *df_refs, n_valid_ref = refs
        for r in df_refs:
            r[...] = jnp.zeros_like(r)
        n_valid_ref[0, 0] = jnp.int32(0)

    # n_total arrives as the prefetched scalar (NOT a static): one compiled
    # executable serves every sample count within a padded bucket
    _accumulate_qoi_chunk_ext(fine_ref[...], coarse_ref[...], i, refs,
                              scratch, n_total=ntot_ref[0], **params)


def _out_specs_ext():
    df_block = lambda: pl.BlockSpec((R_PAD, _LANES), lambda i, *_: (0, 0),
                                    memory_space=pltpu.VMEM)
    cov_block = lambda: pl.BlockSpec((R_PAD, R_PAD), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM)
    return [df_block(), df_block(), df_block(), df_block(),
            cov_block(), cov_block(), cov_block(), cov_block(),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM)]


def _out_shapes_ext():
    df = lambda: jax.ShapeDtypeStruct((R_PAD, _LANES), jnp.float32)
    cov = lambda: jax.ShapeDtypeStruct((R_PAD, R_PAD), jnp.float32)
    return [df(), df(), df(), df(), cov(), cov(), cov(), cov(),
            jax.ShapeDtypeStruct((1, 1), jnp.int32)]


def _combine_ext(outs, n_moments):
    """(hi, lo) output pairs -> f64 host result (lane sums finish in f64)."""
    (s_hi, s_lo, s2_hi, s2_lo, cf_hi, cf_lo, cc_hi, cc_lo, nv) = outs

    def df64(hi, lo):
        return (np.asarray(hi, dtype=np.float64)
                + np.asarray(lo, dtype=np.float64))

    R = n_moments
    return ExtendedMomentResult(
        sums=df64(s_hi, s_lo)[:R].sum(axis=1),
        sums2=df64(s2_hi, s2_lo)[:R].sum(axis=1),
        cov_fine=df64(cf_hi, cf_lo)[:R, :R],
        cov_coarse=df64(cc_hi, cc_lo)[:R, :R],
        n_valid=int(np.asarray(nv)[0, 0]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_moments", "chunk", "domain", "ref_domain", "basis",
                     "is_level0", "interpret", "symmetric"))
def _samples_dispatch_ext(fine, coarse, n_total, *, n_moments, domain,
                          ref_domain, basis, chunk, is_level0, interpret,
                          symmetric=False):
    n_pad = fine.shape[1]
    n_chunks = n_pad // chunk
    a, b = domain
    ref_lo, ref_hi = ref_domain
    scale = (np.float64(ref_hi) - np.float64(ref_lo)) / (
        np.float64(b) - np.float64(a))
    if symmetric:
        shift, offset = (np.float64(a) + np.float64(b)) / 2.0, 0.0
    else:
        shift, offset = np.float64(a), np.float64(ref_lo)
    kernel = functools.partial(
        _samples_kernel_ext, n_moments=n_moments, chunk=chunk,
        scale_df=_df_const(scale), shift_df=_df_const(shift),
        offset_df=_df_const(offset), eft=_eft_for(interpret),
        ref_lo=ref_lo, ref_hi=ref_hi, basis=basis, is_level0=is_level0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_out_specs_ext(),
        scratch_shapes=[
            pltpu.VMEM((R_PAD, chunk), jnp.float32),  # phi fine hi
            pltpu.VMEM((R_PAD, chunk), jnp.float32),  # phi fine lo
            pltpu.VMEM((R_PAD, chunk), jnp.float32),  # phi coarse hi
            pltpu.VMEM((R_PAD, chunk), jnp.float32),  # phi coarse lo
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_out_shapes_ext(),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(n_total.reshape(1).astype(jnp.int32), fine, coarse)


def moment_pipeline_from_samples_extended(fine, coarse, n_moments, *,
                                          domain, ref_domain=(-1.0, 1.0),
                                          basis="legendre", chunk=8192,
                                          is_level0=False, interpret=False,
                                          symmetric=False):
    """Extended-precision stored-samples moment pipeline (one level).

    Same contract as pallas_kernels.moment_pipeline_from_samples; tracks
    the all-f64 host pipeline on identical f32 QoIs to the double-float
    bound (ops/precision.py:df_error_bound). Result combined to f64 on
    host. NaN QoIs are dropped; the tail past ``len(fine)`` is NaN-padded.
    """
    assert n_moments <= R_PAD
    assert chunk % 1024 == 0 and chunk <= 8192
    n = int(np.shape(fine)[0])
    # pad to a power-of-two bucket of chunks (not just the next chunk
    # multiple): each distinct padded shape is a 10-30 s remote AOT
    # compile, so shapes must stay O(log n) over adaptive growth; the true
    # count rides the prefetched scalar and pads are NaN (doubly invalid)
    from mlmc_tpu.sample_storage import _pow2_at_least

    n_pad = _pow2_at_least(-(-n // chunk), floor=1) * chunk
    xp = jnp if isinstance(fine, jax.Array) else np
    fine = xp.pad(xp.asarray(fine, jnp.float32), (0, n_pad - n),
                  constant_values=np.nan).reshape(1, n_pad)
    if coarse is None:
        coarse = xp.full((1, n_pad), np.nan, jnp.float32)
    else:
        coarse = xp.pad(xp.asarray(coarse, jnp.float32), (0, n_pad - n),
                        constant_values=np.nan).reshape(1, n_pad)
    outs = _samples_dispatch_ext(
        fine, coarse, jnp.asarray(n, jnp.int32), n_moments=n_moments,
        domain=tuple(float(v) for v in domain),
        ref_domain=tuple(float(v) for v in ref_domain), basis=basis,
        chunk=chunk, is_level0=is_level0, interpret=interpret,
        symmetric=symmetric)
    return _combine_ext(outs, n_moments)


def synth_moment_pipeline_from_noise_extended(noise, n_moments, *,
                                              fine_step, coarse_step,
                                              domain, chunk=8192,
                                              is_level0=False,
                                              interpret=False):
    """Extended-precision synth pipeline from HBM noise.

    The QoI transform (reference synth_simulation.py:38-46) runs as eager
    f32 primitives, then the df pipeline. CAVEAT for strict comparisons:
    the transform's ``sqrt`` is the backend's — on real TPU hardware it is
    NOT correctly rounded (~40% of values differ from numpy's by 1 ulp),
    so a host reference must consume the device-computed QoI bits
    (``precision.f64_reference_moments_strict(fine32=..., coarse32=...)``)
    rather than recompute the transform; XLA:CPU matches numpy exactly."""
    xp = jnp if isinstance(noise, jax.Array) else np
    noise = xp.asarray(noise, jnp.float32)
    err = xp.sqrt(jnp.float32(1e-4) + xp.abs(noise))
    fine = noise + jnp.float32(fine_step) * err
    coarse = noise + jnp.float32(coarse_step) * err
    return moment_pipeline_from_samples_extended(
        fine, coarse, n_moments, domain=domain, ref_domain=(-1.0, 1.0),
        basis="legendre", chunk=chunk, is_level0=is_level0,
        interpret=interpret, symmetric=True)
