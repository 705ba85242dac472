from ia_spgemm_tpu.parallel.distributed import (  # noqa: F401
    ShardedCSR,
    partition_rows,
    dist_spgemm,
    gather_result,
)
from ia_spgemm_tpu.parallel.mesh import make_mesh  # noqa: F401
from ia_spgemm_tpu.parallel import multihost  # noqa: F401
