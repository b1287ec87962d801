"""Legacy maxent solver variant with size continuation.

Re-design of reference mlmc/tool/distribution.py:6-456: the same density
model as SimpleDistribution, fitted through a geometric size-continuation
schedule (approximation sizes growing by ~1.2x, kept odd, reference
:96-124) with warm-started multipliers between sizes (``extend_size``,
:234-250). Each stage reuses the jitted/host Newton machinery of
mlmc_tpu.tool.simple_distribution instead of scipy trust-exact (maxiter
200, :134-141); the continuation improves robustness for badly
conditioned high moment counts.
"""
import numpy as np

from mlmc_tpu.tool.simple_distribution import SimpleDistribution


class Distribution:
    """Continuation-based maxent fit (legacy API)."""

    def __init__(self, moments_obj, moment_data, domain=None,
                 force_decay=(True, True), verbose=False):
        if domain is None:
            domain = moments_obj.domain
        self.domain = domain
        self.decay_penalty = force_decay
        self._verbose = verbose
        self.moment_means = np.asarray(moment_data[:, 0], dtype=float)
        self.moment_vars = np.asarray(moment_data[:, 1], dtype=float)
        self.moments_fn = moments_obj
        self.approx_size = len(self.moment_means)
        self.multipliers = None
        self._inner = None

    @staticmethod
    def size_schedule(final_size, start=5, factor=1.2):
        """Geometric, odd-valued continuation sizes (reference :96-124)."""
        sizes = []
        s = start
        while s < final_size:
            s_odd = s if s % 2 == 1 else s + 1
            if not sizes or s_odd > sizes[-1]:
                sizes.append(min(s_odd, final_size))
            s = int(np.ceil(s * factor))
        if not sizes or sizes[-1] != final_size:
            sizes.append(final_size)
        return sizes

    def _extend_size(self, multipliers, new_size):
        """Warm start: pad multipliers with zeros (reference :234-250)."""
        out = np.zeros(new_size)
        if multipliers is not None:
            out[:len(multipliers)] = multipliers
        return out

    def estimate_density_minimize(self, tol=1e-7, reg_param=0.0):
        """Fit with size continuation; returns the final stage's result."""
        multipliers = None
        result = None
        for size in self.size_schedule(self.approx_size):
            moments_data = np.stack(
                (self.moment_means[:size], self.moment_vars[:size]), axis=1)
            inner = SimpleDistribution(
                self.moments_fn, moments_data, domain=self.domain,
                force_decay=self.decay_penalty, verbose=self._verbose)
            # warm start from the previous (smaller) stage
            if multipliers is not None:
                inner._warm_start = self._extend_size(multipliers, size)
                _orig_init = inner._initialize_params

                def _init(sz, tol=None, _inner=inner, _orig=_orig_init):
                    _orig(sz, tol)
                    _inner.multipliers = np.array(_inner._warm_start)

                inner._initialize_params = _init
            result = inner.estimate_density_minimize(tol, reg_param)
            multipliers = np.array(inner.multipliers)
            self._inner = inner
        self.multipliers = multipliers
        return result

    # same interface as the reference root-solver path (:159-181)
    def estimate_density(self, tol=1e-7):
        return self.estimate_density_minimize(tol)

    def eval_moments(self, x):
        assert self._inner is not None, "call estimate_density_minimize first"
        return self._inner.eval_moments(x)

    def end_point_derivatives(self):
        assert self._inner is not None, "call estimate_density_minimize first"
        return self._inner.end_point_derivatives()

    def extend_size(self, multipliers, new_size):
        """Warm-start padding (reference :234-250)."""
        return self._extend_size(multipliers, new_size)

    def density(self, value):
        assert self._inner is not None, "call estimate_density_minimize first"
        return self._inner.density(value)

    def cdf(self, values):
        assert self._inner is not None, "call estimate_density_minimize first"
        return self._inner.cdf(values)
