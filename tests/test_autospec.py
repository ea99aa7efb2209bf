"""Tests for auto-lowering arbitrary JAX models into the Pallas kernel.

CPU CI drives the auto-built specs through the interpret-mode trajectory
kernel; the Mosaic-probe path itself is exercised on the real chip
(``make test-tpu`` / the TPU-gated test at the bottom).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import littlemcmc_tpu as lmc
from littlemcmc_tpu.ops import make_pallas_model_spec, stable_substitute
from littlemcmc_tpu.ops.autospec import _replay

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic probe needs a real TPU backend",
)


def _logistic_model(n=5, N=40, seed=0):
    rng = np.random.RandomState(seed)
    X = jnp.asarray(rng.randn(N, n), jnp.float32)
    y = jnp.asarray((rng.rand(N) > 0.5), jnp.float32)

    def logp_fn(beta):
        z = X @ beta
        return (jnp.sum(y * jax.nn.log_sigmoid(z)
                        + (1 - y) * jax.nn.log_sigmoid(-z))
                - 0.5 * jnp.sum(beta ** 2))

    return logp_fn


def test_spec_factory_extracts_closure_consts():
    logp_fn = _logistic_model()
    spec = make_pallas_model_spec(ndim=5, logp_fn=logp_fn)
    assert spec.ndim == 5
    # X (40, 5) stays 2-d; y (40,) is 2-d-ified for VMEM
    shapes = sorted(np.shape(c) for c in spec.consts)
    assert shapes == [(1, 40), (40, 5)]


def test_spec_factory_validates_signature():
    with pytest.raises(ValueError, match="exactly one"):
        make_pallas_model_spec(lambda q: q, 3, logp_fn=lambda q: 0.0)
    with pytest.raises(ValueError, match="ndim is required"):
        make_pallas_model_spec(logp_fn=lambda q: jnp.sum(q))
    with pytest.raises(ValueError, match="scalar logp"):
        # returns (vector, vector): not a logp_dlogp contract
        make_pallas_model_spec(lambda q: (q, q), 3)


def test_spec_fn_matches_direct_evaluation():
    """The padded-width spec fn reproduces vmap(value_and_grad(f))."""
    logp_fn = _logistic_model()
    spec = make_pallas_model_spec(ndim=5, logp_fn=logp_fn)
    from littlemcmc_tpu.ops.nuts_trajectory_pallas import padded_dim

    npad = padded_dim(5)
    q = np.zeros((8, npad), np.float32)
    q[:, :5] = np.random.RandomState(1).randn(8, 5)
    lp, g = jax.jit(spec.fn)(jnp.asarray(q), *spec.consts)
    lp_ref, g_ref = jax.vmap(jax.value_and_grad(logp_fn))(jnp.asarray(q[:, :5]))
    # tolerances cover the TPU backend's default (bf16-input) matmul
    # precision — the spec preserves the user's own precision setting
    np.testing.assert_allclose(np.asarray(lp[:, 0]), np.asarray(lp_ref),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g[:, :5]), np.asarray(g_ref),
                               rtol=5e-3, atol=1e-3)


def test_replay_rewrites_preserve_values():
    """The rewriting interpreter (bool-transpose and rank-1 TN dot fixes)
    is value-preserving on jaxprs that trigger both rewrites."""
    X = jnp.asarray(np.random.RandomState(0).randn(30, 4), jnp.float32)

    def f(Q):  # batched: vmap inserts bool transposes around select_n
        vg = jax.vmap(jax.value_and_grad(
            lambda b: jnp.sum(jnp.minimum(X @ b, 0.0)) + jnp.sum(X @ b)))
        return vg(Q)

    Q = jnp.asarray(np.random.RandomState(2).randn(8, 4), jnp.float32)
    closed = jax.make_jaxpr(f)(Q)
    prims = {e.primitive.name for e in closed.jaxpr.eqns}
    assert "transpose" in prims  # the rewrite target is actually present
    lp, g = _replay(closed.jaxpr, closed.consts, Q)
    lp_ref, g_ref = f(Q)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-5)


def test_replay_rewrites_gather_scatter_to_onehot_matmuls():
    """Group-indexed models: ``theta[groups]`` gathers and
    ``segment_sum`` scatter-adds are rewritten into one-hot indicator
    matmuls (all three rank<=2 forms), value-preserving and with no
    gather/scatter primitive left in the rewritten computation."""
    J, N = 8, 64
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randint(0, J, N))
    y = jnp.asarray(rng.randn(N).astype(np.float32))
    X = jnp.asarray(rng.randn(J, 3).astype(np.float32))

    def logp(q):
        mu, a, b = q[0], q[1:1 + J], q[1 + J:1 + J + 3]
        pred = mu + a[g] + (X[g] @ b)          # (n,) gather + (k,p) row gather
        per_group = jax.ops.segment_sum((y - pred) ** 2, g, num_segments=J)
        return (-0.5 * jnp.sum((y - pred) ** 2) - 0.01 * jnp.sum(per_group)
                - 0.5 * jnp.sum(a ** 2) - 0.5 * jnp.sum(b ** 2))

    fn = jax.vmap(jax.value_and_grad(logp))
    Q = jnp.asarray(np.random.RandomState(2).randn(8, 1 + J + 3), jnp.float32)
    closed = jax.make_jaxpr(fn)(Q)
    prims = {e.primitive.name for e in closed.jaxpr.eqns}
    assert "gather" in prims and "scatter-add" in prims  # targets present

    lp, grad = _replay(closed.jaxpr, closed.consts, Q)
    lp_ref, grad_ref = fn(Q)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-5)

    # nothing dynamic-indexed survives the rewrite, at any nesting depth
    closed2 = jax.make_jaxpr(
        lambda Q: _replay(closed.jaxpr, closed.consts, Q))(Q)

    def all_prims(jx, acc):
        for e in jx.eqns:
            acc.add(e.primitive.name)
            for key in ("jaxpr", "call_jaxpr"):
                inner = e.params.get(key)
                if inner is not None:
                    all_prims(getattr(inner, "jaxpr", inner), acc)
        return acc

    seen = all_prims(closed2.jaxpr, set())
    assert "gather" not in seen and "scatter-add" not in seen


def test_hierarchical_gather_model_interpret_e2e():
    """A group-indexed hierarchical model auto-lowers and samples
    correctly through the interpret-mode Pallas trajectory kernel — the
    one-hot rewrite end-to-end, not just replay parity."""
    J = 4
    rng = np.random.RandomState(3)
    groups = jnp.asarray(rng.randint(0, J, 40))
    truth = np.array([1.0, -1.0, 0.5, 0.0], np.float32)
    yobs = jnp.asarray(rng.randn(40).astype(np.float32) * 0.5
                       + truth[np.asarray(groups)])

    def logp(q):
        theta = q[1:]
        resid = yobs - jnp.take(theta, groups)
        per_group = jax.ops.segment_sum(resid ** 2, groups, num_segments=J)
        return (-0.5 * jnp.sum(per_group)
                - 0.5 * jnp.sum((theta - q[0]) ** 2) - 0.05 * q[0] ** 2)

    spec = make_pallas_model_spec(ndim=1 + J, logp_fn=logp)
    step = lmc.NUTS(model_ndim=1 + J, pallas_trajectory=spec,
                    pallas_interpret=True)
    trace, stats = lmc.sample(logp_fn=logp, model_ndim=1 + J, chains=8,
                              tune=300, draws=500, random_seed=2, step=step,
                              progressbar=False)
    tr = np.asarray(trace).reshape(-1, 1 + J)
    for g in range(J):
        data_mean = float(yobs[np.asarray(groups) == g].mean())
        assert abs(tr[:, 1 + g].mean() - data_mean) < 0.35
    assert np.asarray(stats["diverging"]).mean() < 0.02


def test_stable_substitute_matches_jax_nn():
    """The jaxpr-level substitution is value- and gradient-identical to
    the jax.nn originals across branch regimes, and eliminates every
    logaddexp-family custom_jvp_call from the differentiated jaxpr."""
    x = jnp.asarray([-30.0, -3.0, -0.5, 0.0, 0.5, 3.0, 30.0], jnp.float32)

    def f(q):
        return (jnp.sum(jax.nn.log_sigmoid(q)) + jnp.sum(jax.nn.softplus(q))
                + jnp.sum(jnp.logaddexp(q, 0.3 * q)))

    sub = stable_substitute(f, x.shape[0])
    # f32 transcendental noise between two correct op sequences reaches
    # ~1e-5 relative on the TPU backend (measured 7.2e-6 on the v5e);
    # the gate is form-equivalence, not bit-identity
    np.testing.assert_allclose(np.asarray(sub(x)), np.asarray(f(x)),
                               rtol=3e-5, atol=1e-6)
    g_ref = jax.grad(f)(x)
    g_sub = jax.grad(sub)(x)
    np.testing.assert_allclose(np.asarray(g_sub), np.asarray(g_ref),
                               rtol=3e-5, atol=1e-6)

    # no custom_jvp_call survives anywhere in the differentiated jaxpr
    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            yield eqn.primitive.name
            for key in ("jaxpr", "call_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    yield from walk(getattr(inner, "jaxpr", inner))

    closed = jax.make_jaxpr(jax.value_and_grad(sub))(x)
    assert "custom_jvp_call" not in set(walk(closed.jaxpr))
    # module globals untouched
    assert jax.nn.log_sigmoid.__module__.startswith("jax")


def test_stable_substitute_preserves_user_custom_jvp():
    """A user custom_jvp that is NOT logaddexp must pass through verbatim
    — including its (deliberately scaled) gradient rule."""

    @jax.custom_jvp
    def myprod(a, b):
        return a * b

    @myprod.defjvp
    def _jvp(primals, tangents):
        a, b = primals
        da, db = tangents
        return a * b, 7.0 * (da * b + a * db)  # deliberately non-standard

    def f(q):
        return jnp.sum(myprod(q, q)) + jnp.sum(jnp.logaddexp(q, 0.0))

    x = jnp.asarray([0.5, 1.0, -1.0, 2.0], jnp.float32)
    sub = stable_substitute(f, 4)
    # the pass-through gate is the 7x-scaled JVP surviving (a dropped
    # rule errs by 7x); the logaddexp term IS substituted, so values
    # carry f32 transcendental noise between the two correct forms
    # (~1.4e-6 relative measured on the v5e)
    np.testing.assert_allclose(np.asarray(sub(x)), np.asarray(f(x)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(sub)(x)),
                               np.asarray(jax.grad(f)(x)), rtol=1e-5)


def test_autospec_interpret_e2e_posterior_parity():
    """A non-zoo user model sampled through the auto-built spec in the
    interpret-mode trajectory kernel matches the XLA tree's posterior."""
    logp_fn = _logistic_model(n=4, N=60, seed=3)
    spec = make_pallas_model_spec(ndim=4, logp_fn=logp_fn)
    step = lmc.NUTS(model_ndim=4, pallas_trajectory=spec, pallas_interpret=True)
    tr_p, st_p = lmc.sample(logp_fn=logp_fn, model_ndim=4, chains=16,
                            tune=200, draws=400, random_seed=8, step=step,
                            progressbar=False)
    tr_x, _ = lmc.sample(logp_fn=logp_fn, model_ndim=4, chains=16,
                         tune=200, draws=400, random_seed=8,
                         progressbar=False)
    mp = tr_p.reshape(-1, 4).mean(axis=0)
    mx = tr_x.reshape(-1, 4).mean(axis=0)
    sp = tr_p.reshape(-1, 4).std(axis=0)
    sx = tr_x.reshape(-1, 4).std(axis=0)
    np.testing.assert_allclose(mp, mx, atol=0.1)
    np.testing.assert_allclose(sp / sx, 1.0, atol=0.2)
    assert 0.6 < np.asarray(st_p["mean_tree_accept"])[:, -100:].mean() < 0.95


@requires_tpu
def test_probe_accepts_user_model_and_rejects_host_callback():
    from littlemcmc_tpu.ops import probe_spec

    spec = make_pallas_model_spec(ndim=5, logp_fn=_logistic_model())
    assert probe_spec(spec)

    # host-callback models cannot be inlined into a TPU kernel
    def np_logp(x):
        return float(-0.5 * np.sum(np.asarray(x) ** 2)), -np.asarray(x)

    wrapped = lmc.from_numpy_callable(np_logp, 3)
    try:
        bad = make_pallas_model_spec(wrapped, 3)
    except Exception:
        return  # rejected at trace time: equally fine
    assert not probe_spec(bad)


@requires_tpu
def test_sample_auto_selects_pallas_for_user_model(caplog):
    import logging

    logp_fn = _logistic_model(n=6, N=80, seed=5)
    with caplog.at_level(logging.INFO, logger="littlemcmc_tpu"):
        trace, stats = lmc.sample(logp_fn=logp_fn, model_ndim=6, chains=64,
                                  tune=200, draws=300, random_seed=2,
                                  progressbar=False)
    assert any("Auto-lowered" in r.message for r in caplog.records)
    assert trace.shape == (64, 300, 6)
    assert 0.6 < np.asarray(stats["mean_tree_accept"])[:, -100:].mean() < 0.95


def test_stable_logaddexp_infinity_corners():
    """The Mosaic-friendly logaddexp must match jnp at the inf corners
    (regression: (-inf, -inf) produced NaN via a - b)."""
    from littlemcmc_tpu.ops.autospec import _stable_logaddexp

    pairs = jnp.asarray([
        [-jnp.inf, -jnp.inf], [jnp.inf, jnp.inf], [-jnp.inf, 1.5],
        [2.0, -jnp.inf], [jnp.inf, 3.0], [0.5, 0.25],
    ])
    got = _stable_logaddexp(pairs[:, 0], pairs[:, 1])
    want = jnp.logaddexp(pairs[:, 0], pairs[:, 1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@requires_tpu
def test_probe_matrix_model_breadth():
    """The auto-lowering probe matrix: common likelihood shapes must all
    lower through Mosaic (each probe is a ~0.5 s compile+value check).
    This is the breadth guarantee behind 'bring your own logp'."""
    from littlemcmc_tpu.ops import probe_spec

    n = 3
    X = jnp.asarray(np.random.RandomState(0).randn(50, n), jnp.float32)
    y = jnp.asarray((np.random.RandomState(1).rand(50) > 0.5), jnp.float32)
    _GROUPS50 = jnp.asarray(np.random.RandomState(2).randint(0, n, 50))
    matrix = {
        "gaussian_quadratic": lambda b: -0.5 * jnp.sum((X @ b) ** 2),
        "logistic": lambda b: jnp.sum(
            y * jax.nn.log_sigmoid(X @ b)
            + (1 - y) * jax.nn.log_sigmoid(-(X @ b))) - 0.5 * jnp.sum(b**2),
        "poisson_loglink": lambda b: jnp.sum(
            y * (X @ b) - jnp.exp(jnp.clip(X @ b, -10, 10))),
        "student_t": lambda b: -jnp.sum(2.0 * jnp.log1p((X @ b) ** 2 / 4.0)),
        "laplace_prior": lambda b: jnp.sum(
            y * (X @ b)) - jnp.sum(jnp.abs(b)) - 0.05 * jnp.sum((X @ b) ** 2),
        "hierarchical_ncp": lambda b: (
            -0.5 * b[0] ** 2
            - 0.5 * jnp.sum((b[1:] - b[0]) ** 2 * jnp.exp(-b[0]))),
        "softplus_link": lambda b: -jnp.sum(
            (y - jax.nn.softplus(X @ b)) ** 2) - 0.5 * jnp.sum(b**2),
        "piecewise": lambda b: jnp.sum(
            jnp.where(X @ b > 0, -(X @ b) ** 2, X @ b)) * 0.1,
        # group-indexed hierarchical shape: gather + segment_sum become
        # one-hot indicator matmuls in _replay
        "hierarchical_gather": lambda b: (
            -0.5 * jnp.sum((y - jnp.take(b, _GROUPS50)) ** 2)
            - 0.1 * jnp.sum(jax.ops.segment_sum(
                (y - jnp.take(b, _GROUPS50)) ** 2, _GROUPS50, num_segments=n))
            - 0.5 * jnp.sum(b ** 2)),
    }
    failures = []
    for name, f in matrix.items():
        spec = make_pallas_model_spec(ndim=n, logp_fn=f)
        if not probe_spec(spec):
            failures.append(name)
    assert not failures, f"models failed the Mosaic probe: {failures}"


def test_gather_scatter_model_falls_back_cleanly(caplog):
    """The auto-path contract on a group-indexed hierarchical model
    (``jnp.take`` + ``segment_sum``): either the one-hot rewrite lowers
    it and the probe passes (expected on TPU), or the auto path falls
    back to the XLA tree with a log line (e.g. CPU, where ``probe_spec``
    cannot compile Mosaic) — and ``sample()`` is statistically correct
    either way (the reference's "bring your own logp" contract,
    quickstart.rst:37-49).
    """
    import logging

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu.ops.autospec import try_auto_spec

    rng = np.random.RandomState(3)
    groups = jnp.asarray(rng.randint(0, 4, size=40))
    yobs = jnp.asarray(rng.randn(40) * 0.5 + np.array([1.0, -1.0, 0.5, 0.0])[
        np.asarray(groups)], jnp.float32)

    def logp(q):
        # q = [mu_pop, theta_1..4]: gather per-row group means, scatter
        # residual sums per group
        theta = q[1:]
        mu_row = jnp.take(theta, groups)              # gather
        resid = yobs - mu_row
        per_group = jax.ops.segment_sum(resid ** 2, groups, num_segments=4)
        return (-0.5 * jnp.sum(per_group)
                - 0.5 * jnp.sum((theta - q[0]) ** 2) - 0.05 * q[0] ** 2)

    with caplog.at_level(logging.INFO, logger="littlemcmc_tpu"):
        spec = try_auto_spec(logp, 5, is_logp_only=True)
    if spec is None:
        # clean, logged fallback
        assert any("XLA tree" in r.message for r in caplog.records), (
            [r.message for r in caplog.records])

    # end-to-end correctness regardless of which path was selected
    trace, stats = lmc.sample(logp_fn=logp, model_ndim=5, chains=8,
                              tune=300, draws=500, random_seed=2,
                              progressbar=False)
    tr = np.asarray(trace).reshape(-1, 5)
    # posterior group means must recover the data's group means
    for g in range(4):
        data_mean = float(yobs[np.asarray(groups) == g].mean())
        post = tr[:, 1 + g].mean()
        assert abs(post - data_mean) < 0.35, (g, post, data_mean)
    assert np.asarray(stats["diverging"]).mean() < 0.02


@requires_tpu
def test_probe_matrix_without_trace_time_swaps():
    """Diagnostic for retiring the stable-substitution step entirely.

    ``_replay``'s jaxpr-level rewrites (bool transposes, rank-1 dots)
    postdate the logaddexp substitution and may subsume it. This probes
    the custom-JVP-heavy models with ``stable_swaps=False``: if every
    row lowers, even the (already context-safe) substitution is
    redundant. Records the outcome either way — the auto path keeps the
    substitution until this passes on real hardware.
    """
    from littlemcmc_tpu.ops import probe_spec

    n = 3
    X = jnp.asarray(np.random.RandomState(0).randn(50, n), jnp.float32)
    y = jnp.asarray((np.random.RandomState(1).rand(50) > 0.5), jnp.float32)
    matrix = {
        "logistic_logsigmoid": lambda b: jnp.sum(
            y * jax.nn.log_sigmoid(X @ b)
            + (1 - y) * jax.nn.log_sigmoid(-(X @ b))) - 0.5 * jnp.sum(b**2),
        "softplus_link": lambda b: -jnp.sum(
            (y - jax.nn.softplus(X @ b)) ** 2) - 0.5 * jnp.sum(b**2),
        "logaddexp_mix": lambda b: jnp.sum(
            jnp.logaddexp(X @ b, -(X @ b))) - 0.5 * jnp.sum(b**2),
    }
    outcomes = {}
    for name, f in matrix.items():
        try:
            spec = make_pallas_model_spec(ndim=n, logp_fn=f,
                                          stable_swaps=False)
            outcomes[name] = bool(probe_spec(spec))
        except Exception as e:
            outcomes[name] = f"trace-error: {type(e).__name__}"
    print("no-swaps probe outcomes:", outcomes)
    # the swapped path must still work regardless
    for name, f in matrix.items():
        spec = make_pallas_model_spec(ndim=n, logp_fn=f)
        assert probe_spec(spec), f"{name} failed WITH swaps"
