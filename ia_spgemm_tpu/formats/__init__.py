from ia_spgemm_tpu.formats.types import CSR, COO, ELL, DIA, Dense  # noqa: F401
from ia_spgemm_tpu.formats import convert  # noqa: F401
