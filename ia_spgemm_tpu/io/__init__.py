from ia_spgemm_tpu.io.mmio import (  # noqa: F401
    MatrixMarketHeader,
    read_mtx,
    read_mtx_to_csr,
    write_mtx,
)
