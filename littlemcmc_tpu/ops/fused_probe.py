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
           "probe_stat_io_layout", "probe_block_outputs_3d",
           "lowrank_kernel_supported", "PROBED_LAYOUTS"]

# Which BlockSpec shape class each probe compiles on the real backend.
# The fused kernels declare the classes they use
# (``fused_nuts_pallas.BLOCKSPEC_LAYOUTS`` /
# ``fused_hmc_pallas.BLOCKSPEC_LAYOUTS``) and
# ``tests/test_fused_nuts.py`` pins that every declared class appears
# here — so a new layout in the kernels without a probe is a CI failure,
# not a silent on-chip Mosaic crash (the round-3 failure mode: probes
# passed while the real kernel's 16-lane 3-D stats block could not
# compile).
PROBED_LAYOUTS = {
    "rows_2d": "probe_stat_io_layout",        # (RW, Npad) idx (i, 0)
    "scal16_2d": "probe_stat_io_layout",      # (RW, 16*K) idx (i, 0)
    "trace_3d": "probe_stat_io_layout",       # (1, RW, Npad) idx (t, i, 0)
    "stats_2d_flat": "probe_stat_io_layout",  # (RW, 16*K) idx (t*B+i, 0)
    "smem_scalar_in": "probe_stat_io_layout",  # seed vector in SMEM
    "const_nd": "probe_stat_io_layout",       # grid-invariant const block
    "sq_2d": "probe_smem_accumulate",         # (Npad, Npad) idx (0, 0)
    "smem_f32_scratch": "probe_smem_accumulate",
    "mean_3d": "probe_block_outputs_3d",      # (1, 8, Npad) idx (i, 0, 0)
    "sq_3d": "probe_block_outputs_3d",        # (1, Npad, Npad) idx (i, 0, 0)
    "lane_3d": "probe_block_outputs_3d",      # (1, 8, 128) idx (i, 0, 0)
    "fac_2d": "probe_thin_factor",            # (FR, Npad) shared factor
}


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


def probe_stat_io_layout(interpret: bool = False) -> bool:
    """Miniature of the fused kernels' exact I/O block layout.

    Uses the same grid/BlockSpec constructs as
    ``fused_nuts_pallas.build_fused_nuts_op`` /
    ``fused_hmc_pallas.build_fused_hmc_op`` at ``pack=1`` (the
    flagship-model class that failed Mosaic in round 3): a 2-D
    ``(blocks, T)`` grid with "arbitrary" semantics, an SMEM scalar
    input, ``(RW, Npad)`` chain-row blocks indexed ``(i, 0)``,
    ``(RW, 16)`` packed-scalar blocks indexed ``(i, 0)``, a
    grid-invariant const block, 3-D ``(1, RW, Npad)`` trace blocks
    indexed ``(t, i, 0)`` written through an ``.at[0]`` view, the
    flattened 2-D ``(RW, 16)`` stats blocks indexed ``(t*B + i, 0)``
    with per-column slice writes, and VMEM scratch persisting across
    the ``T`` grid steps.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, RW, Npad, W = 2, 3, 8, 128, 16

    def kernel(seed_ref, q0, sin, const, tr, st, qf, sout, q_s, sa):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            q_s[:] = q0[:]
            sa[:] = sin[:]

        q = q_s[:] + const[0:RW, :] + jnp.float32(seed_ref[0])
        q_s[:] = q
        tr.at[0][:] = q
        # per-column slice writes into the 16-lane stats block (set_st
        # at K=1, the layout Mosaic rejected as a 3-D block in round 3)
        for c in range(3):
            st[:, c:c + 1] = sa[:, c:c + 1] + jnp.float32(10 * c) + \
                jnp.float32(1.0) * t
        sa[:, 0:1] = sa[:, 0:1] + 1.0

        @pl.when(t == T - 1)
        def _():
            qf[:] = q_s[:]
            sout[:] = sa[:]

    rng = np.random.RandomState(1)
    q0 = rng.standard_normal((B * RW, Npad)).astype(np.float32)
    sin = rng.standard_normal((B * RW, W)).astype(np.float32)
    const = rng.standard_normal((RW, Npad)).astype(np.float32)
    seed = np.array([3, 0], np.int32)

    import jax as _jax
    f32 = jnp.float32
    row_in = pl.BlockSpec((RW, Npad), lambda i, t: (i, 0),
                          memory_space=pltpu.VMEM)
    sin_spec = pl.BlockSpec((RW, W), lambda i, t: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(const.shape, lambda i, t: (0, 0),
                              memory_space=pltpu.VMEM)
    tr_spec = pl.BlockSpec((1, RW, Npad), lambda i, t: (t, i, 0),
                           memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((RW, W), lambda i, t, _b=B: (t * _b + i, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  row_in, sin_spec, const_spec],
        out_shape=[_jax.ShapeDtypeStruct((T, B * RW, Npad), f32),
                   _jax.ShapeDtypeStruct((T * B * RW, W), f32),
                   _jax.ShapeDtypeStruct((B * RW, Npad), f32),
                   _jax.ShapeDtypeStruct((B * RW, W), f32)],
        out_specs=[tr_spec, st_spec, row_in, sin_spec],
        scratch_shapes=[pltpu.VMEM((RW, Npad), f32),
                        pltpu.VMEM((RW, W), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(seed, q0, sin, const)
    tr, st, qf, sout = (np.asarray(o) for o in outs)

    # numpy replay
    q_s = q0.reshape(B, RW, Npad).copy()
    sa = sin.reshape(B, RW, W).copy()
    tr_e = np.zeros((T, B, RW, Npad), np.float32)
    st_e = np.zeros((T, B, RW, W), np.float32)
    for t in range(T):
        for i in range(B):
            q_s[i] = q_s[i] + const + 3.0
            tr_e[t, i] = q_s[i]
            for c in range(3):
                st_e[t, i, :, c] = sa[i, :, c] + 10.0 * c + float(t)
            sa[i, :, 0] += 1.0
    # only the 3 written stat columns are defined — the rest of the
    # 16-lane block is uninitialized output memory (like the real
    # kernels' unused packed-stat slots)
    ok = (np.allclose(tr, tr_e.reshape(T, B * RW, Npad), atol=1e-5)
          and np.allclose(st[:, :3], st_e.reshape(T * B * RW, W)[:, :3],
                          atol=1e-5)
          and np.allclose(qf, q_s.reshape(B * RW, Npad), atol=1e-5)
          and np.allclose(sout, sa.reshape(B * RW, W), atol=1e-5))
    return bool(ok)


def probe_block_outputs_3d(interpret: bool = False) -> bool:
    """The adapt_dense per-block 3-D output blocks lower and index right.

    ``(1, 8, Npad)`` pooled-mean rows, ``(1, Npad, Npad)`` pooled raw
    moments, and ``(1, 8, 128)`` counter rows, all indexed ``(i, 0, 0)``
    over a ``(blocks, T)`` grid and written through ``.at[0]`` views on
    the last grid step (``fused_nuts_pallas._adapt_dense_outputs``).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, N = 2, 3, 128

    def kernel(mf, sqf, cf, acc):
        i = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] = acc[:] + jnp.float32(i + 1)

        @pl.when(t == T - 1)
        def _():
            mf.at[0][:] = acc[0:8, :]
            sqf.at[0][:] = acc[:]
            cf.at[0][:] = acc[0:8, :] * 2.0

    f32 = jnp.float32
    mean_out = pl.BlockSpec((1, 8, N), lambda i, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    sq_out = pl.BlockSpec((1, N, N), lambda i, t: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    lane_out = pl.BlockSpec((1, 8, N), lambda i, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, T),
        out_shape=[jax.ShapeDtypeStruct((B, 8, N), f32),
                   jax.ShapeDtypeStruct((B, N, N), f32),
                   jax.ShapeDtypeStruct((B, 8, N), f32)],
        out_specs=[mean_out, sq_out, lane_out],
        scratch_shapes=[pltpu.VMEM((N, N), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )()
    mf, sqf, cf = (np.asarray(o) for o in outs)
    ok = True
    for i in range(B):
        v = float((i + 1) * T)
        ok = ok and np.all(mf[i] == v) and np.all(sqf[i] == v) \
            and np.all(cf[i] == 2 * v)
    return bool(ok)


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
                  and probe_stat_io_layout(interpret)
                  and probe_smem_accumulate(interpret)
                  and probe_block_outputs_3d(interpret))
        except Exception as e:  # Mosaic lowering / runtime failure
            _log.info("Fused-engine probe failed to compile/run (%s: %s)",
                      type(e).__name__, e)
            ok = False
        if not ok:
            _log.warning(
                "Fused multi-draw engine disabled: Mosaic capability probe "
                "failed on backend %r (cos lowering, grid-scratch "
                "persistence, or a kernel I/O block layout). Falling back "
                "to the per-draw engine; pass fuse_draws=True to force the "
                "fused engine and see the underlying error.", key[0])
        _CACHE[key] = ok
    return _CACHE[key]
