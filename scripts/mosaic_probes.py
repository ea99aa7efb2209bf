"""Pre-flight Mosaic probes for the fused multi-draw kernels.

Two tiny pallas_calls that isolate the only Mosaic behaviors the fused
kernels (ops/fused_nuts_pallas.py, ops/fused_hmc_pallas.py) rely on but
which CPU interpret mode cannot validate:

1. ``cos`` lowering — the on-core Box-Muller momentum refresh needs
   ``jnp.cos`` on f32 vectors (interpret mode runs it; Mosaic's lowering
   is the open question).
2. Grid scratch persistence — the fused kernels carry chain state in
   VMEM scratch across the T grid steps of one pallas_call; Mosaic must
   preserve scratch contents between sequential grid iterations.

Run (on TPU): python scripts/mosaic_probes.py
(``--interpret`` validates the probe logic itself on CPU.)
Exit code 0 iff both probes pass.
"""

import sys

import numpy as np

INTERPRET = "--interpret" in sys.argv


def probe_cos():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.cos(x_ref[:]) + jnp.sin(x_ref[:])

    x = np.linspace(-6, 6, 8 * 128, dtype=np.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=INTERPRET,
    )(x)
    ref = np.cos(x) + np.sin(x)
    ok = np.allclose(np.asarray(out), ref, atol=1e-5)
    print("cos/sin lowering:", "OK" if ok else
          f"FAIL max_err={np.abs(np.asarray(out) - ref).max():.2e}")
    return ok


def probe_grid_scratch():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 7

    def kernel(o_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.ones_like(acc_ref)

        @pl.when(t > 0)
        def _():
            acc_ref[:] = acc_ref[:] * 2.0 + 1.0

        @pl.when(t == T - 1)
        def _():
            o_ref[:] = acc_ref[:]

    out = pl.pallas_call(
        kernel,
        grid=(T,),
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=INTERPRET,
    )()
    expect = 1.0
    for _ in range(T - 1):
        expect = expect * 2.0 + 1.0  # 127 for T=7
    ok = np.allclose(np.asarray(out), expect)
    print("grid scratch persistence:", "OK" if ok else
          f"FAIL got={np.asarray(out).ravel()[0]} want={expect}")
    return ok


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    ok = probe_cos() & probe_grid_scratch()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
