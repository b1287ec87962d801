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
