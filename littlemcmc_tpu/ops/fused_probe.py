"""Runtime capability probes for the fused multi-draw kernels.

The fused kernels (:mod:`.fused_nuts_pallas`, :mod:`.fused_hmc_pallas`)
rely on two Mosaic behaviors that CPU interpret mode exercises but
cannot validate for the real TPU lowering:

1. ``cos``/``sin`` lowering — the on-core Box–Muller momentum refresh
   evaluates ``jnp.cos`` on f32 vectors.
2. Grid scratch persistence — chain state lives in VMEM scratch across
   the ``T`` sequential grid steps of one ``pallas_call``.
3. (pooled-dense adaptation) f32 SMEM scalar scratch read/modify/write
   plus a rows-contraction ``dot_general`` accumulating into VMEM
   scratch — the block-local pooled-covariance update.

:func:`fused_engine_supported` compiles and runs these tiny probe kernels
once per process (cached per backend) and reports whether both behave
correctly. The driver consults it when *auto-selecting* the fused
engine (``sample(fuse_draws=None)``) on a real TPU backend, so a Mosaic
regression degrades to the per-draw engine with a log line instead of
crashing mid-run. An explicit ``fuse_draws=True`` bypasses the probe —
the user asked for the fused engine and should see the real error.

``scripts/mosaic_probes.py`` wraps the same probes as a pre-flight CLI.
"""

from __future__ import annotations

import logging

import numpy as np

_log = logging.getLogger("littlemcmc_tpu")

_CACHE: dict = {}

__all__ = ["fused_engine_supported", "probe_cos", "probe_grid_scratch",
           "probe_smem_accumulate", "probe_thin_factor",
           "lowrank_kernel_supported"]


def probe_cos(interpret: bool = False) -> bool:
    """``jnp.cos``/``jnp.sin`` lower and evaluate correctly on f32 rows."""
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
        interpret=interpret,
    )(x)
    return bool(np.allclose(np.asarray(out), np.cos(x) + np.sin(x),
                            atol=1e-5))


def probe_grid_scratch(interpret: bool = False) -> bool:
    """VMEM scratch persists across sequential grid iterations."""
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )()
    expect = 1.0
    for _ in range(T - 1):
        expect = expect * 2.0 + 1.0  # 127 for T=7
    return bool(np.allclose(np.asarray(out), expect))


def probe_smem_accumulate(interpret: bool = False) -> bool:
    """f32 SMEM scalar scratch + rows-contraction accumulate into VMEM.

    The adapt_dense constructs: ``wsc[slot]`` scalar read/modify/write in
    SMEM across grid steps, and an exact-f32 ``dot_general`` contracting
    the row axis ``(R, N) x (R, N) -> (N, N)`` accumulated into an
    ``(N, N)`` VMEM scratch (the pooled-covariance update of
    :func:`.fused_nuts_pallas._dense_welford_batch_add`).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, R, N = 5, 8, 128

    def kernel(x_ref, o_ref, c_ref, acc_ref, wsc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            wsc[0] = 1.0

        x = x_ref[:] * wsc[0]
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            x, x, dimension_numbers=(((0,), (0,)), ((), ())),
            precision="highest", preferred_element_type=jnp.float32)
        wsc[0] = wsc[0] + 1.0

        @pl.when(t == T - 1)
        def _():
            o_ref[:] = acc_ref[:]
            c_ref[0, 0] = wsc[0]

    x = np.linspace(-1, 1, R * N, dtype=np.float32).reshape(R, N)
    out, cnt = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((R, N), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((N, N), lambda t: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((N, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32),
                        pltpu.SMEM((4,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x)
    expect = sum((x * w) .T @ (x * w) for w in range(1, T + 1))
    return (bool(np.allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-4))
            and float(np.asarray(cnt)[0, 0]) == float(T + 1))


def probe_thin_factor(interpret: bool = False) -> bool:
    """The low-rank metric's kernel constructs lower and run correctly.

    Exercises what ``metric="lowrank"`` adds over the dense path
    (:func:`.nuts_trajectory_pallas._make_lowrank_velocities`): static
    sublane slices of a small factor block (``fac[:k]``, single rows
    ``fac[k:k+1]``), a thin lane-contracting ``dot_general``
    ``(R, N) x (k, N) -> (R, k)``, and the thin expansion back
    ``(R, k) x (k, N) -> (R, N)``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, N, k = 8, 128, 8

    def kernel(x_ref, fac_ref, o_ref):
        x = x_ref[:]
        fac = fac_ref[:]
        Vt = fac[:k, :]
        lam_k = fac[k:k + 1, :k]
        alpha_row = fac[k + 1:k + 2, :]
        alpha_k = fac[k + 1:k + 2, :k]
        c = jax.lax.dot_general(
            x, Vt, dimension_numbers=(((1,), (1,)), ((), ())),
            precision="highest", preferred_element_type=jnp.float32)
        o_ref[:] = alpha_row * x + jnp.dot(
            c * (lam_k - alpha_k), Vt,
            precision="highest", preferred_element_type=jnp.float32)

    rng = np.random.RandomState(0)
    x = rng.standard_normal((R, N)).astype(np.float32)
    V = np.linalg.qr(rng.standard_normal((N, k)))[0].astype(np.float32)
    lam = np.linspace(9.0, 0.25, k).astype(np.float32)
    alpha = np.float32(0.37)
    fac = np.zeros((16, N), np.float32)
    fac[:k] = V.T
    fac[k, :k] = lam
    fac[k + 1, :] = alpha
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        interpret=interpret,
    )(x, fac)
    expect = alpha * x + (x @ V) * (lam - alpha) @ V.T
    return bool(np.allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5))


def lowrank_kernel_supported(interpret: bool = False) -> bool:
    """True iff ``metric="lowrank"`` can run on this backend.

    Consulted by the driver when *auto-selecting* the Pallas trajectory
    for a pooled low-rank run, so a Mosaic gap degrades to the XLA tree
    with a log line. Cached per backend like
    :func:`fused_engine_supported`.
    """
    if interpret:
        return True
    import jax

    key = ("lowrank", jax.default_backend())
    if key not in _CACHE:
        try:
            ok = probe_thin_factor(interpret)
        except Exception as e:
            _log.info("Low-rank kernel probe failed to compile/run (%s: %s)",
                      type(e).__name__, e)
            ok = False
        if not ok:
            _log.warning(
                "Pallas low-rank metric path disabled: Mosaic capability "
                "probe failed on backend %r (thin factor matmuls / sublane "
                "slices). Pooled adapt_lowrank runs the XLA tree instead.",
                key[1])
        _CACHE[key] = ok
    return _CACHE[key]


def fused_engine_supported(interpret: bool = False) -> bool:
    """True iff the fused kernels' Mosaic dependencies hold on this backend.

    Interpret mode is trusted by construction (the CPU test suite runs
    the full fused engine through it), so ``interpret=True`` returns
    True without compiling anything. Results are cached per
    ``(backend, interpret)`` for the life of the process.
    """
    if interpret:
        return True
    import jax

    key = (jax.default_backend(), interpret)
    if key not in _CACHE:
        try:
            ok = (probe_cos(interpret) and probe_grid_scratch(interpret)
                  and probe_smem_accumulate(interpret))
        except Exception as e:  # Mosaic lowering / runtime failure
            _log.info("Fused-engine probe failed to compile/run (%s: %s)",
                      type(e).__name__, e)
            ok = False
        if not ok:
            _log.warning(
                "Fused multi-draw engine disabled: Mosaic capability probe "
                "failed on backend %r (cos lowering or grid-scratch "
                "persistence). Falling back to the per-draw engine; pass "
                "fuse_draws=True to force the fused engine and see the "
                "underlying error.", key[0])
        _CACHE[key] = ok
    return _CACHE[key]
