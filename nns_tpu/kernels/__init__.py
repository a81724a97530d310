from nns_tpu.kernels.oracle import (  # noqa: F401
    linear_scan,
    nn_oracle_f64,
    recall_at_1,
)
from nns_tpu.kernels.xla_bruteforce import (  # noqa: F401
    nns_distance_matrix,
    nns_expansion_matmul,
)
from nns_tpu.kernels.pallas_fused import (  # noqa: F401
    FusedBruteForce,
    fused_fallback,
    nns_fused,
    nns_fused_point_major,
    nns_fused_queries_resident,
    nns_fused_streaming,
    nns_two_level,
)
from nns_tpu.kernels.cell_list import (  # noqa: F401
    CellListEngine,
    nns_cell_list,
)
from nns_tpu.kernels.topk import nns_topk  # noqa: F401
