from mlmc_tpu.plot import plots
from mlmc_tpu.plot import violinplot
