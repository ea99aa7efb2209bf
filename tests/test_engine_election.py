"""Pin the auto engine election to the measured A/B artifact.

VERDICT r4 item 1: the routing table users get under ``fuse_draws=None``
must match the measured winner per (model, chains, metric) shape in
``AB_FUSED.json`` (device-only timing, ``scripts/ab_fused.py``). Two
assertions per artifact row:

1. ``elect_fused_engine`` (the pure routing predicate) picks the arm the
   artifact measured fastest — adjudicated only when the fused/per-draw
   gap is outside a +-10% noise band (the artifact records repeats; rows
   inside the band are ties where either routing is acceptable);
2. the engine the ``auto`` arm *actually ran* (stamped by
   ``sample(perf_report=...)``) agrees with the predicate, so the inline
   wiring in ``sample()`` cannot drift from the table.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB_PATH = os.path.join(REPO, "AB_FUSED.json")

# config name -> (model ctor, chains, pooled, metric)
_CONFIGS = {
    "std_normal_1d": ("StandardNormal", (1,), 1024, False, "diag"),
    "corr_gaussian_100d_diag": (
        "CorrelatedGaussian", (100,), 1024, False, "diag"),
    "eight_schools_10k_chains": ("EightSchools", (), 10240, False, "diag"),
    "corr_gaussian_100d_diag_pooled": (
        "CorrelatedGaussian", (100,), 1024, True, "diag"),
    "corr_gaussian_100d_full_pooled": (
        "CorrelatedGaussian", (100,), 256, True, "dense"),
    "corr_gaussian_100d_full_pooled_1024": (
        "CorrelatedGaussian", (100,), 1024, True, "dense"),
}


def _artifact():
    if not os.path.exists(AB_PATH):
        pytest.skip("AB_FUSED.json not generated")
    with open(AB_PATH) as f:
        art = json.load(f)
    if "results" not in art:
        pytest.skip("AB_FUSED.json is in a pre-round-5 format")
    return art["results"]


def _elected(name):
    """What the routing predicate decides for this artifact config."""
    from littlemcmc_tpu import models
    from littlemcmc_tpu.ops.nuts_trajectory_pallas import resolve_pack
    from littlemcmc_tpu.sampling import elect_fused_engine

    ctor, args, chains, pooled, metric = _CONFIGS[name]
    model = getattr(models, ctor)(*args)
    pack = resolve_pack(model.pallas_trajectory_spec(), model.ndim, chains)
    return elect_fused_engine(metric, pooled, pack)


@pytest.mark.parametrize("name", sorted(_CONFIGS))
def test_election_matches_measured_winner(name):
    results = _artifact()
    if name not in results:
        pytest.skip(f"{name} not in AB_FUSED.json")
    row = results[name]
    ratio = row.get("fused_over_perdraw")
    if ratio is None or abs(ratio - 1.0) <= 0.10:
        pytest.skip(f"fused/per_draw = {ratio}: inside the noise band, "
                    "either routing is acceptable")
    fused_wins = ratio > 1.0
    assert _elected(name) == fused_wins, (
        f"{name}: artifact winner is "
        f"{'fused' if fused_wins else 'per_draw'} "
        f"(fused/per_draw = {ratio}) but elect_fused_engine says "
        f"{'fused' if _elected(name) else 'per_draw'}")


@pytest.mark.parametrize("name", sorted(_CONFIGS))
def test_auto_arm_ran_the_elected_engine(name):
    results = _artifact()
    if name not in results:
        pytest.skip(f"{name} not in AB_FUSED.json")
    auto = results[name].get("auto", {})
    engine = auto.get("engine")
    if engine is None:
        pytest.skip("no auto arm recorded")
    assert engine.startswith("fused" if _elected(name) else "per_draw"), (
        f"{name}: sample(fuse_draws=None) ran {engine} but the routing "
        f"table says {'fused' if _elected(name) else 'per_draw'}")


def test_auto_within_5pct_of_best_arm():
    """The done-criterion from VERDICT r4 item 1: the auto arm's device
    throughput is >= 0.95x the best measured arm on every config."""
    results = _artifact()
    bad = {}
    for name, row in results.items():
        r = row.get("auto_over_best")
        if r is not None and r < 0.95:
            bad[name] = r
    assert not bad, f"auto arm below 0.95x of best: {bad}"
