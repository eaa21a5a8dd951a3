from fastposecnn_tpu.ops.class_compress import class_compress  # noqa: F401
from fastposecnn_tpu.ops.connected_components import label_components  # noqa: F401
from fastposecnn_tpu.ops.aggregation import aggregate_instances  # noqa: F401
from fastposecnn_tpu.ops.matching import match_instances  # noqa: F401
