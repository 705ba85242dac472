from ia_spgemm_tpu.ops.esc import (  # noqa: F401
    plan_spgemm,
    spgemm_csr,
    spgemm_coo,
)
from ia_spgemm_tpu.ops.dense import spgemm_dense  # noqa: F401
from ia_spgemm_tpu.ops.ell import spgemm_ell  # noqa: F401
from ia_spgemm_tpu.ops.dia import spgemm_dia  # noqa: F401
from ia_spgemm_tpu.ops.flops import get_flop  # noqa: F401
from ia_spgemm_tpu.ops.features import get_info1, get_info2, get_info3  # noqa: F401
from ia_spgemm_tpu.ops.density import density_image  # noqa: F401
