"""Solute-transport simulation on the Darcy velocity field — device-native.

Re-design of the reference's second flagship workflow, the ``02_conc``
solute-transport study (reference test/02_conc/proc_conc.py:21-70 — a
FlowSim subclass whose QoI is the solute mass flux through the outflow
region extracted from flow123d's mass_balance.yaml; the transport physics
is declared in test/02_conc/02_conc_tmpl.yaml: a Darcy flow equation
operator-split with a ``Solute_Advection_FV`` / advection-diffusion solute
equation, an initial unit concentration in a source ("repo") region and
breakthrough observed over time). That workflow shells out to gmsh and
flow123d per sample and reads YAML back; here the WHOLE coupled sample —
GRF conductivity, pressure solve, velocity field, explicit upwind
finite-volume transport, breakthrough-curve extraction — is one jitted
program that vmaps over the sample batch.

Scheme
------
* Flow: the ``DiffusionSimulation`` pressure solve (5-point FV, CG with
  spectral/multigrid preconditioning) on the unit square, p=1 left edge,
  p=0 right edge, no-flux top/bottom. Face volumetric fluxes are the
  transmissibility-weighted pressure drops (h-independent per unit depth).
* Transport: cell concentrations c[n, n] in a medium of porosity ``phi``;
  explicit first-order upwind FV in flux (conservative) form, optional
  isotropic diffusive flux ``D`` between interior cells. Mass is conserved
  to roundoff BY CONSTRUCTION (every interior face's contribution cancels
  in the flux-form update), independent of the CG residual.
* Time stepping: a ``lax.scan`` over a STATIC step count (set per level at
  ``level_instance``; scales with the grid so the advective CFL number is
  resolution-independent). The step size is per-sample:
  ``dt = min(cfl-stable dt, t_end / n_steps)``. When a sample's velocity
  field is so fast that the stable dt cannot cover the observation horizon
  in the static step budget, the sample FAILS (NaN results) — mapping the
  reference's sample-failure semantics (flow123d non-convergence →
  "job failed", reference mlmc/tool/pbs_job.py:320-327) onto the CFL
  constraint instead of silently integrating a different time range.
* QoI: the solute mass outflux rate through the right edge on a fixed
  observation-time grid (the breakthrough curve), interpolated from the
  per-step series — a time-series quantity exercising ``TimeSeriesType``
  end to end (the reference observes concentration over time and extracts
  the maximum regional flux, proc_conc.py:44-70).

The fine and coarse grids of one sample share the underlying conductivity
realization exactly as ``DiffusionSimulation`` does (same key: circulant
point-sampling or shared RFF modes+phases).
"""
import copy
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.diffusion import DiffusionSimulation
from mlmc_tpu.quantity.quantity_spec import QuantitySpec
from mlmc_tpu.level_simulation import LevelSimulation


class TransportSimulation(DiffusionSimulation):
    """Darcy flow + upwind FV solute transport, breakthrough-curve QoI.

    Config keys (on top of ``DiffusionSimulation``'s field/solver keys):

    - ``porosity``: medium porosity phi (default 0.1),
    - ``diffusion``: isotropic diffusive face coefficient D (default 0),
    - ``obs_times``: observation times of the breakthrough curve
      (default 8 points spanning [0.05, 0.4] — about 0.7 to 5 advective
      transit times at K=1),
    - ``source_box``: initial-concentration region as (x0, x1, y0, y1)
      in unit-square coordinates (default a block left of center —
      the "repo" region of the reference template),
    - ``observe_points``: (x, y) cell locations whose concentration time
      series join the QoI (the reference template declares a chain of
      ``observe_points`` between source and outlet,
      02_conc_tmpl.yaml:94-135); default 4 points on the flow centerline,
    - ``scheme``: ``"upwind"`` (default, first-order donor cell — the
      reference's ``Solute_Advection_FV`` analog) or ``"muscl"``
      (minmod-limited MUSCL reconstruction + SSP-RK2 time stepping:
      second-order in smooth regions, TVD, conservative; sharper fronts
      at the same grid, analogous to the template's DG alternative),
    - ``cfl``: CFL safety factor (default 0.5),
    - ``steps_per_cell``: static step budget = steps_per_cell * n
      (default 96 — sized so sigma<=1 log-normal fields cover the default
      horizon at the stable dt with margin; measured worst-of-32 draws at
      sigma=1 needs ~82 steps/cell for t_end=0.4. Wilder media need a
      larger budget or a shorter horizon, else their fastest samples fail).
    """

    PHI = 0.1
    CFL = 0.5
    STEPS_PER_CELL = 96
    SOURCE_BOX = (0.125, 0.375, 0.375, 0.625)
    # default breakthrough horizon: pore velocity at K=1 is 1/PHI = 10,
    # source center to outlet = 0.75 -> arrival ~0.075; observe to ~5x that
    OBS_TIMES = tuple(float(t) for t in np.linspace(0.05, 0.4, 8))
    OBSERVE_POINTS = ((0.45, 0.5), (0.6, 0.5), (0.75, 0.5), (0.9, 0.5))

    def __init__(self, config=None):
        super().__init__(config)
        self._config.setdefault("obs_times", self.OBS_TIMES)
        self._config.setdefault("observe_points", self.OBSERVE_POINTS)

    def level_instance(self, fine_level_params: List[float],
                       coarse_level_params: List[float]) -> LevelSimulation:
        level_sim = super().level_instance(fine_level_params,
                                           coarse_level_params)
        config = level_sim.config_dict
        config["res_format"] = self.result_format()
        factor = int(config.get("steps_per_cell", self.STEPS_PER_CELL))
        config["_n_steps_fine"] = factor * config["fine_n"]
        config["_n_steps_coarse"] = factor * max(config["coarse_n"], 1)
        return level_sim

    # ------------------------------------------------------------------ #
    # physics
    # ------------------------------------------------------------------ #
    @classmethod
    def _face_fluxes(cls, config, K, p):
        """Volumetric face fluxes (per unit depth) from the pressure field.

        Positive = flow toward increasing index / out of the domain.
        The interior transmissibilities are harmonic means (per unit h),
        so flux across a face of length h is ``T * (p_upstream - p_down)``
        with the h's cancelled; boundary half-faces carry 2K.
        """
        Kx, Ky = cls._face_conductivities(K)
        Fx = Kx * (p[:, :-1] - p[:, 1:])          # [n, n-1], j -> j+1
        Fy = Ky * (p[:-1, :] - p[1:, :])          # [n-1, n], i -> i+1
        F_in = 2.0 * K[:, 0] * (1.0 - p[:, 0])    # [n], into the domain
        F_out = 2.0 * K[:, -1] * p[:, -1]         # [n], out of the domain
        return Fx, Fy, F_in, F_out

    @classmethod
    def _initial_concentration(cls, config, n):
        box = config.get("source_box", cls.SOURCE_BOX)
        h = 1.0 / n
        centers = (jnp.arange(n) + 0.5) * h
        X, Y = jnp.meshgrid(centers, centers, indexing="ij")
        # grid rows index y (matching the pressure solve's row=i layout is
        # irrelevant here: the flow axis is axis 1, the box is axis-aligned)
        inside = ((X >= box[2]) & (X <= box[3])
                  & (Y >= box[0]) & (Y <= box[1]))
        return inside.astype(jnp.float32)

    @classmethod
    def _breakthrough(cls, config, K, n, n_steps):
        """Integrate transport on one grid; return the flat QoI vector:
        the outflux-rate series at ``obs_times`` followed by the
        concentration time series at every ``observe_points`` cell
        ([time, location] order, matching ``result_format``). NaN when the
        CFL-stable step cannot cover the horizon within the static step
        budget."""
        phi = config.get("porosity", cls.PHI)
        D = config.get("diffusion", 0.0)
        cfl = config.get("cfl", cls.CFL)
        obs_times = jnp.asarray(config["obs_times"])
        t_end = jnp.max(obs_times)
        h = 1.0 / n
        vol = phi * h * h

        p = cls._solve_pressure(config, K)
        Fx, Fy, F_in, F_out = cls._face_fluxes(config, K, p)

        # positivity bound: dt <= vol / (sum of outgoing coefficients);
        # each of the 4 diffusive faces contributes D
        out_x = (jnp.concatenate([jnp.maximum(Fx, 0.0),
                                  jnp.maximum(F_out, 0.0)[:, None]], 1)
                 + jnp.concatenate([jnp.maximum(-F_in, 0.0)[:, None],
                                    jnp.maximum(-Fx, 0.0)], 1))
        zy = jnp.zeros((1, n), Fx.dtype)
        out_y = (jnp.concatenate([jnp.maximum(Fy, 0.0), zy], 0)
                 + jnp.concatenate([zy, jnp.maximum(-Fy, 0.0)], 0))
        scheme = config.get("scheme", "upwind")
        # MUSCL face values amplify a cell's outflow by up to 1.5x (the
        # minmod slope adds at most half a local difference); tighten the
        # positivity bound accordingly
        amp = 1.5 if scheme == "muscl" else 1.0
        s_max = amp * jnp.max(out_x + out_y) + 4.0 * D
        dt = jnp.minimum(cfl * vol / s_max, t_end / n_steps)

        c0 = cls._initial_concentration(config, n).astype(Fx.dtype)

        # observation cells: the point grid is static config, so the
        # gather indices are compile-time constants
        pts = config.get("observe_points", cls.OBSERVE_POINTS)
        cols = jnp.asarray([min(int(pt[0] * n), n - 1) for pt in pts],
                           jnp.int32)
        rows = jnp.asarray([min(int(pt[1] * n), n - 1) for pt in pts],
                           jnp.int32)

        def out_rate(c):
            return jnp.sum(F_out * jnp.where(F_out > 0, c[:, -1], 0.0))

        def observe(c):
            return (out_rate(c),
                    c[rows, cols] if len(pts) else jnp.zeros((0,), c.dtype))

        def minmod(a, b):
            return jnp.where(a * b > 0,
                             jnp.where(jnp.abs(a) < jnp.abs(b), a, b), 0.0)

        def net_rate(c):
            """Conservative mass rate into each cell (flux form: interior
            faces cancel exactly, so total mass is conserved to roundoff
            for BOTH schemes)."""
            if scheme == "muscl":
                # minmod-limited linear reconstruction; boundary cells fall
                # back to first order (zero one-sided slope)
                zc = jnp.zeros((n, 1), c.dtype)
                dx = c[:, 1:] - c[:, :-1]
                sx = 0.5 * minmod(jnp.concatenate([zc, dx], 1),
                                  jnp.concatenate([dx, zc], 1))
                dy = c[1:, :] - c[:-1, :]
                sy = 0.5 * minmod(jnp.concatenate([zy, dy], 0),
                                  jnp.concatenate([dy, zy], 0))
                cfx = jnp.where(Fx > 0, c[:, :-1] + sx[:, :-1],
                                c[:, 1:] - sx[:, 1:])
                cfy = jnp.where(Fy > 0, c[:-1, :] + sy[:-1, :],
                                c[1:, :] - sy[1:, :])
            else:
                cfx = jnp.where(Fx > 0, c[:, :-1], c[:, 1:])
                cfy = jnp.where(Fy > 0, c[:-1, :], c[1:, :])
            Mx = Fx * cfx
            My = Fy * cfy
            M_in = F_in * jnp.where(F_in > 0, 0.0, c[:, 0])   # inlet conc 0
            M_out = F_out * jnp.where(F_out > 0, c[:, -1], 0.0)
            if D:
                Mx = Mx + D * (c[:, :-1] - c[:, 1:])
                My = My + D * (c[:-1, :] - c[1:, :])
            return (jnp.concatenate([M_in[:, None], Mx], 1)
                    - jnp.concatenate([Mx, M_out[:, None]], 1)
                    + jnp.concatenate([zy, My], 0)
                    - jnp.concatenate([My, zy], 0))

        def step(c, _):
            obs = observe(c)
            if scheme == "muscl":
                # SSP-RK2 (Heun): convex combination of Euler steps keeps
                # the limited scheme TVD
                c1 = c + (dt / vol) * net_rate(c)
                c_new = 0.5 * (c + c1 + (dt / vol) * net_rate(c1))
            else:
                c_new = c + (dt / vol) * net_rate(c)
            return c_new, obs

        c_end, (rates, cpts) = jax.lax.scan(step, c0, None, length=n_steps)
        rate_end, cpt_end = observe(c_end)
        series = jnp.concatenate([rates, rate_end[None]])
        cpt_series = jnp.concatenate([cpts, cpt_end[None]], axis=0)
        times = jnp.arange(n_steps + 1) * dt
        qoi_flux = jnp.interp(obs_times, times, series)
        qoi_conc = jax.vmap(
            lambda s: jnp.interp(obs_times, times, s))(cpt_series.T)  # [P,T]
        qoi = jnp.concatenate([qoi_flux, qoi_conc.T.ravel()])
        covered = dt * n_steps >= t_end * (1.0 - 1e-6)
        return jnp.where(covered, qoi, jnp.nan)

    # ------------------------------------------------------------------ #
    # Simulation interface
    # ------------------------------------------------------------------ #
    @classmethod
    def _calculate_one(cls, config, key):
        fine_n = config["fine_n"]
        K_fine = cls._conductivity(config, key, fine_n)
        fine = cls._breakthrough(config, K_fine, fine_n,
                                 config["_n_steps_fine"])
        if config["coarse_n"] > 0:
            if "_circ_eig" in config:
                K_coarse = cls._coarse_from_fine_K(config, K_fine)
            else:
                K_coarse = cls._conductivity(config, key, config["coarse_n"])
            coarse = cls._breakthrough(config, K_coarse, config["coarse_n"],
                                       config["_n_steps_coarse"])
        else:
            coarse = jnp.zeros_like(fine)
        return fine, coarse

    @classmethod
    def calculate_batch(cls, config, keys, attempts=None):
        fine, coarse = jax.vmap(lambda k: cls._calculate_one(config, k))(keys)
        failed = jnp.any(jnp.isnan(fine), axis=1) | jnp.any(
            jnp.isnan(coarse), axis=1)
        return fine, coarse, failed

    def n_ops_estimate(self, step):
        n = 1.0 / step
        # pressure solve ~ n^2 log n plus n_steps ~ n transport sweeps of n^2
        return n * n * (np.log(max(n, 2.0)) + 0.25 * n)

    def result_format(self) -> List[QuantitySpec]:
        obs = [float(t) for t in self._config.get("obs_times",
                                                  self.OBS_TIMES)]
        pts = self._config.get("observe_points", self.OBSERVE_POINTS)
        specs = [QuantitySpec(name="conc_flux", unit="kg/s", shape=(1,),
                              times=obs, locations=["outflow"])]
        if len(pts):
            specs.append(QuantitySpec(
                name="conc", unit="1", shape=(1,), times=obs,
                locations=["(%g, %g)" % (p[0], p[1]) for p in pts]))
        return specs
