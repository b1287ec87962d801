"""cond_field-style CLI application (reference test/01_cond_field/process_simple.py).

Darcy diffusion MLMC behind the ProcessBase verbs:

    python examples/process_diffusion.py run  /tmp/cond_field --clean
    python examples/process_diffusion.py process /tmp/cond_field
    python examples/process_diffusion.py renew /tmp/cond_field
"""
from mlmc_tpu.tool.process_base import ProcessBase
from mlmc_tpu.sim.diffusion import DiffusionSimulation


class DiffusionProcess(ProcessBase):
    def __init__(self, argv=None):
        self.step_range = (1 / 4, 1 / 32)
        self.n_levels = 3
        self.n_moments = 15
        super().__init__(argv=argv)

    def create_simulation(self):
        return DiffusionSimulation(dict(sigma=1.0, corr_length=0.3,
                                        n_modes=128))

    def initial_n_samples(self):
        return [200, 20]

    def target_var(self):
        return 1e-3


if __name__ == "__main__":
    DiffusionProcess()
