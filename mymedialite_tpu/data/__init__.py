from mymedialite_tpu.data.arrays import (  # noqa: F401
    Csr, InteractionData, PosOnlyData, RatingData, build_csr, padded_history,
)
from mymedialite_tpu.data.mapping import IdentityMapping, Mapping  # noqa: F401
from mymedialite_tpu.data.scale import RatingScale  # noqa: F401
