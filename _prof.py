import numpy as np, time, jax, jax.numpy as jnp, functools
from ia_spgemm_tpu.cli.main import enable_compilation_cache
enable_compilation_cache()
from bench import build_matrix
from ia_spgemm_tpu.formats.types import CSR
from ia_spgemm_tpu.formats import convert
from ia_spgemm_tpu.ops import bitonic
def log(*a): print(time.strftime("%H:%M:%S"), *a, flush=True)
a = build_matrix()
A = convert.csr_to_ell(CSR.from_scipy(a.astype(np.float32)), check_guard=False)
plan = bitonic.plan_bitonic(A, A)
def t(label, fn, *args, **kw):
    jax.block_until_ready(fn(*args, **kw)); ts=[]
    for _ in range(5):
        t0=time.perf_counter(); jax.block_until_ready(fn(*args, **kw)); ts.append((time.perf_counter()-t0)*1e3)
    log(f"{label:28s} {float(np.median(ts)):8.1f} ms")
t("expand", bitonic._expand_ell, A.col_ind, A.values, A.col_ind, A.values, width=plan.width, run=plan.run)
key, val = jax.block_until_ready(bitonic._expand_ell(A.col_ind, A.values, A.col_ind, A.values, width=plan.width, run=plan.run))
f = functools.partial(bitonic._sort_compress_rows, width=plan.width, interpret=False)
t("kernel skip R=64", f, key, val, start_kk=2*plan.run, tile_rows=64)
t("kernel noskip R=64", f, key, val, start_kk=2, tile_rows=64)
t("kernel skip R=8", f, key, val, start_kk=2*plan.run, tile_rows=8)
t("kernel skip R=16", f, key, val, start_kk=2*plan.run, tile_rows=16)
t("kernel skip R=32", f, key, val, start_kk=2*plan.run, tile_rows=32)
t("kernel skip R=128", f, key, val, start_kk=2*plan.run, tile_rows=128)
