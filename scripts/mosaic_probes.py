"""Pre-flight Mosaic probes for the fused multi-draw kernels.

Thin CLI over :mod:`littlemcmc_tpu.ops.fused_probe` — the same probes
``sample(fuse_draws=None)`` consults automatically before auto-selecting
the fused engine on a TPU backend:

1. ``cos``/``sin`` lowering (the on-core Box-Muller momentum refresh).
2. Grid scratch persistence across sequential grid iterations (chain
   state lives in VMEM scratch across the T draws of one pallas_call).

Run (on TPU): python scripts/mosaic_probes.py
(``--interpret`` validates the probe logic itself on CPU.)
Exit code 0 iff both probes pass.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INTERPRET = "--interpret" in sys.argv


def main():
    import jax

    if INTERPRET:
        # validate the probe logic itself without touching the (possibly
        # tunneled, possibly dead) default backend
        jax.config.update("jax_platforms", "cpu")

    from littlemcmc_tpu.ops.fused_probe import (probe_cos,
                                                probe_grid_scratch,
                                                probe_smem_accumulate,
                                                probe_thin_factor)

    print("backend:", jax.default_backend(), jax.devices())
    ok_cos = probe_cos(INTERPRET)
    print("cos/sin lowering:", "OK" if ok_cos else "FAIL")
    ok_scratch = probe_grid_scratch(INTERPRET)
    print("grid scratch persistence:", "OK" if ok_scratch else "FAIL")
    ok_smem = probe_smem_accumulate(INTERPRET)
    print("SMEM f32 scalars + rows-contraction accumulate:",
          "OK" if ok_smem else "FAIL")
    ok_thin = probe_thin_factor(INTERPRET)
    print("thin factor matmuls + sublane slices (lowrank metric):",
          "OK" if ok_thin else "FAIL")
    sys.exit(0 if (ok_cos and ok_scratch and ok_smem and ok_thin) else 1)


if __name__ == "__main__":
    main()
