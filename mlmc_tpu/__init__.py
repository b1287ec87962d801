"""mlmc_tpu — TPU-native multilevel Monte Carlo estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GeoMop/MLMC
(https://github.com/GeoMop/MLMC): sample scheduling across levels, estimation
of generalized moment functions, maximum-entropy PDF reconstruction, and a
lazy Quantity array-algebra — with samples as a sharded device axis instead
of scheduler work items.

The public facade mirrors the reference package facade
(reference mlmc/__init__.py:108-117) so user scripts port directly.
"""

from mlmc_tpu.moments import Moments, Legendre, Monomial, Fourier, TransformedMoments
from mlmc_tpu.quantity.quantity import (
    Quantity,
    QuantityConst,
    QuantityMean,
    QuantityStorage,
    make_root_quantity,
)
from mlmc_tpu.quantity.quantity_spec import QuantitySpec, ChunkSpec
from mlmc_tpu.quantity.quantity_types import (
    QType,
    ScalarType,
    BoolType,
    ArrayType,
    TimeSeriesType,
    FieldType,
    DictType,
)
from mlmc_tpu.sample_storage import SampleStorage, Memory
from mlmc_tpu.sample_storage_hdf import SampleStorageHDF
try:  # native engine is optional (needs a C++ toolchain at first use)
    from mlmc_tpu.sample_storage_bin import SampleStorageBin
except Exception:  # pragma: no cover
    SampleStorageBin = None
from mlmc_tpu.level_simulation import LevelSimulation
from mlmc_tpu.sampling_pool import (
    SamplingPool,
    OneProcessPool,
    ProcessPool,
    ThreadPool,
    DeviceBatchPool,
)
from mlmc_tpu.sampler import Sampler
from mlmc_tpu.estimator import Estimate
from mlmc_tpu.sim.simulation import Simulation
from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.sim.synth_simulation_workspace import SynthSimulationWorkspace
from mlmc_tpu.sim.shooting import ShootingSimulation1D, ShootingSimulation2D
from mlmc_tpu.sim.diffusion import DiffusionSimulation

__version__ = "0.1.0"
