from mlmc_tpu.ops.fused_estimate import (
    fused_level_moments,
    fused_mlmc_moments,
    MomentAccumulators,
)
