"""One-off probe: which packed-stat output layouts Mosaic accepts.

Reproduces the round-3 on-chip failure (`BENCH_r03.json` tail:
"Slice shape along dimension 2 must be aligned to tiling (128), but is
16") in isolation and tests candidate fixes:

  A. 3-D block (1, RW, W) over (T, RT, W), idx (t, i, 0)  [current/failing]
  B. 2-D block (RW, W) over (T*RT, W), idx (t*B+i, 0)     [per-draw layout]
  C. 3-D block (1, RW, 128) over (T, RT, 128)             [lane-padded]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, RT, RW, W = 4, 32, 16, 16
B = RT // RW


def run(name, out_shape, out_spec, write3d):
    def kernel(o_ref):
        i = pl.program_id(0)
        t = pl.program_id(1)
        val = (i * 1000 + t).astype(jnp.float32)
        if write3d:
            o_ref.at[0][:] = jnp.full((RW, o_ref.shape[-1]), val, jnp.float32)
        else:
            o_ref[:] = jnp.full((RW, o_ref.shape[-1]), val, jnp.float32)

    try:
        out = pl.pallas_call(
            kernel,
            grid=(B, T),
            out_shape=out_shape,
            out_specs=out_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )()
        out = np.asarray(out)
        # spot-check one block
        if write3d:
            ok = out[1, RW, 0] == 1 * 1000 + 1
        else:
            ok = out[1 * B * RW + 1 * RW, 0] == 1 * 1000 + 1
        print(f"{name}: COMPILED, value check {'OK' if ok else 'BAD'}")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:140]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")
        return False


f32 = jnp.float32
run("A  3-D (1,RW,16) idx (t,i,0)",
    jax.ShapeDtypeStruct((T, RT, W), f32),
    pl.BlockSpec((1, RW, W), lambda i, t: (t, i, 0),
                 memory_space=pltpu.VMEM),
    write3d=True)
run("B  2-D (RW,16) idx (t*B+i,0)",
    jax.ShapeDtypeStruct((T * RT, W), f32),
    pl.BlockSpec((RW, W), lambda i, t: (t * B + i, 0),
                 memory_space=pltpu.VMEM),
    write3d=False)
run("C  3-D (1,RW,128) idx (t,i,0)",
    jax.ShapeDtypeStruct((T, RT, 128), f32),
    pl.BlockSpec((1, RW, 128), lambda i, t: (t, i, 0),
                 memory_space=pltpu.VMEM),
    write3d=True)
print("backend:", jax.default_backend())
sys.exit(0)
