"""Prototype: sort kernel with in-VMEM gather-consuming prologue.

Checks Mosaic supports: 3-D blocks (ka, 128, 128), static [e] slicing,
(128,128) transposes, sublane-slice select, concat to (width, L).
Validates vs numpy on CPU interpreter, then times on TPU.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SENT = np.int32(np.iinfo(np.int32).max)
L = 128


def _proto_kernel(g_ref, av_ref, key_ref, val_ref, *, ka: int, run: int,
                  width: int):
    """g_ref: (ka, L, 128) per tile — e-major gathered wide rows
    [col_f(run) val_f(run) col_r(run) val_r(run)] for L output rows.
    av_ref: (ka, L) a_val per entry (transposed).
    Emits key/val (width, L) in the cols-kernel product layout."""
    ks = []
    vs = []
    for e in range(ka):
        ge = g_ref[e]                     # (L, 128)
        geT = ge.T                        # (128, L)
        if e % 2 == 1:
            c = geT[2 * run:3 * run]      # (run, L)
            vbits = geT[3 * run:4 * run]
        else:
            c = geT[0:run]
            vbits = geT[run:2 * run]
        v = jax.lax.bitcast_convert_type(vbits, jnp.float32)
        av = av_ref[e]                    # (L,)
        valid = c >= 0
        ks.append(jnp.where(valid, c, SENT))
        vs.append(jnp.where(valid, av[None, :] * v, 0.0))
    pad = width - ka * run
    if pad:
        ks.append(jnp.full((pad, L), SENT, jnp.int32))
        vs.append(jnp.zeros((pad, L), jnp.float32))
    key_ref[:] = jnp.concatenate(ks, axis=0)
    val_ref[:] = jnp.concatenate(vs, axis=0)


@functools.partial(jax.jit, static_argnames=("ka", "run", "width",
                                             "interpret"))
def proto_expand(g, avT, *, ka: int, run: int, width: int,
                 interpret: bool):
    m = avT.shape[1]
    grid = (m // L,)
    return pl.pallas_call(
        functools.partial(_proto_kernel, ka=ka, run=run, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ka, L, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ka, L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((width, L), lambda i: (0, i),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct((width, m), jnp.int32),
                   jax.ShapeDtypeStruct((width, m), jnp.float32)),
        interpret=interpret,
    )(g, avT)


def build_inputs(m, ka, k, run, seed=0):
    rng = np.random.default_rng(seed)
    kb = run - 3
    b_col = np.full((k, run), -1, np.int32)
    b_val = np.zeros((k, run), np.float32)
    for j in range(k):
        ln = rng.integers(1, kb + 1)
        cols = np.sort(rng.choice(k, size=ln, replace=False)).astype(np.int32)
        b_col[j, :ln] = cols
        b_val[j, :ln] = rng.standard_normal(ln).astype(np.float32)
    a_col = np.full((m, ka), -1, np.int32)
    a_val = np.zeros((m, ka), np.float32)
    for r in range(m):
        ln = rng.integers(0, ka + 1)
        a_col[r, :ln] = rng.integers(0, k, ln)
        a_val[r, :ln] = rng.standard_normal(ln).astype(np.float32)
    return a_col, a_val, b_col, b_val


def main():
    interpret = jax.default_backend() != "tpu"
    m, ka, k, run = (256, 5, 64, 8) if interpret else (32768, 29, 32768, 32)
    width = 1 << int(np.ceil(np.log2(max(ka * run, 128))))
    a_col, a_val, b_col, b_val = build_inputs(m, ka, k, run)

    # XLA side: wide table + e-major gather
    @jax.jit
    def gather_emajor(a_col_d, b_col_d, b_val_d):
        bvb = jax.lax.bitcast_convert_type(b_val_d, jnp.int32)
        wide = jnp.concatenate(
            [b_col_d, bvb, jnp.flip(b_col_d, axis=1),
             jnp.flip(bvb, axis=1)], axis=1)
        if wide.shape[1] < 128:
            wide = jnp.pad(wide, ((0, 0), (0, 128 - wide.shape[1])))
        wide = jnp.pad(wide, ((0, 1), (0, 0)), constant_values=-1)
        rows = jnp.where(a_col_d >= 0, jnp.clip(a_col_d, 0, k - 1), k)
        idx = rows.T.reshape(-1)            # e-major: (ka*m,)
        g = wide[idx]                       # (ka*m, 128)
        return g.reshape(ka, m, 128)

    g = gather_emajor(jnp.asarray(a_col), jnp.asarray(b_col),
                      jnp.asarray(b_val))
    avT = jnp.asarray(a_val.T)
    key, val = jax.block_until_ready(
        proto_expand(g, avT, ka=ka, run=run, width=width,
                     interpret=interpret))

    # numpy oracle of the expand layout
    key_np = np.asarray(key)
    val_np = np.asarray(val)
    ok = True
    rngchk = np.random.default_rng(1)
    for _ in range(200):
        r = int(rngchk.integers(0, m))
        e = int(rngchk.integers(0, ka))
        j = a_col[r, e]
        if j < 0:
            exp_c = np.full(run, SENT, np.int64)
            exp_v = np.zeros(run)
        else:
            c = b_col[j].astype(np.int64)
            v = b_val[j].astype(np.float64)
            if e % 2 == 1:
                c, v = c[::-1], v[::-1]
            exp_c = np.where(c >= 0, c, SENT)
            exp_v = np.where(c >= 0, a_val[r, e] * v, 0.0)
        got_c = key_np[e * run:(e + 1) * run, r]
        got_v = val_np[e * run:(e + 1) * run, r]
        if not (got_c == exp_c).all():
            ok = False
            print("COL MISMATCH", r, e, got_c[:8], exp_c[:8])
            break
        if not np.allclose(got_v, exp_v, rtol=1e-6):
            ok = False
            print("VAL MISMATCH", r, e, got_v[:8], exp_v[:8])
            break
    print("correct:", ok)

    if not interpret:
        from ia_spgemm_tpu.bench import profiling
        r1 = profiling.device_time_ms(gather_emajor, jnp.asarray(a_col),
                                      jnp.asarray(b_col),
                                      jnp.asarray(b_val))
        r2 = profiling.device_time_ms(
            proto_expand, g, avT, ka=ka, run=run, width=width,
            interpret=False)
        print(json.dumps({"gather_emajor": round(r1["device_ms"], 3),
                          "prologue_kernel": round(r2["device_ms"], 3)}))


if __name__ == "__main__":
    main()
