from ia_spgemm_tpu.bench.harness import (  # noqa: F401
    AlgorithmResult,
    BenchReport,
    run_benchmark,
)
