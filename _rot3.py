import numpy as np, time, jax, jax.numpy as jnp
from ia_spgemm_tpu.cli.main import enable_compilation_cache
enable_compilation_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def log(*a): print(time.strftime("%H:%M:%S"), *a, flush=True)

def make(shape_block, axis, n_rot, shift, grid_m, idx_map):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(n_rot):
            x = pltpu.roll(x, shift, axis=axis) + 1
        o_ref[:] = x
    def pc(x):
        return pl.pallas_call(
            kern,
            grid=(grid_m,),
            in_specs=[pl.BlockSpec(shape_block, idx_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape_block, idx_map, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((shape_block[0]*grid_m if idx_map.__name__=='m0' else shape_block[0],
                                            shape_block[1] if idx_map.__name__=='m0' else shape_block[1]*grid_m), x.dtype))(x)
    @jax.jit
    def run(x):
        return pc(x)[-1, -1]
    return run

rng = np.random.default_rng(0)
m = 32768
# lane-axis rotates: blocks (32, 1024), roll axis=1
x1 = jnp.asarray(rng.integers(0, 100, (m, 1024)).astype(np.int32))
def m0(i): return (i, 0)
m0.__name__ = 'm0'
f1 = make((32, 1024), 1, 120, 16, m//32, m0)
float(f1(x1)); ts=[]
for _ in range(5):
    t0=time.perf_counter(); float(f1(x1)); ts.append((time.perf_counter()-t0)*1e3)
log("lane-axis rolls (32,1024) s=16:", round(float(np.median(ts)),1), "ms")
# sublane-axis rotates: blocks (1024, 128), roll axis=0 — same total elems
x2 = jnp.asarray(rng.integers(0, 100, (1024, m)).astype(np.int32))
def m1(i): return (0, i)
m1.__name__ = 'm1'
f2 = make((1024, 128), 0, 120, 16, m//128, m1)
float(f2(x2)); ts=[]
for _ in range(5):
    t0=time.perf_counter(); float(f2(x2)); ts.append((time.perf_counter()-t0)*1e3)
log("sublane-axis rolls (1024,128) s=16:", round(float(np.median(ts)),1), "ms")
