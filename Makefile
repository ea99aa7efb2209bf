.PHONY: test test-fast test-tpu doctest bench baseline lint

# Three serial shards, each a fresh process: the XLA CPU compiler
# segfaults after a few hundred accumulated in-process compilations
# (reproduced at different suite positions in round 5 — cumulative, not
# test-specific; every crashing test passes in a fresh process), and the
# round-5 pooled tune schedule raised the per-test compile count.
test:
	python -m pytest tests/test_[a-f]*.py -q
	python -m pytest tests/test_[g-m]*.py -q
	python -m pytest tests/test_[n-z]*.py -q
	python -m pytest --doctest-modules littlemcmc_tpu -q

test-fast:
	python -m pytest tests/ -q -x -k "not recovery and not parity"

# Run the TPU-gated Pallas trajectory-kernel tests on the real chip
# (they are skipped under the default CPU-forced suite).
test-tpu:
	LMC_TEST_PLATFORM=tpu python -m pytest tests/test_trajectory_pallas.py tests/test_autospec.py tests/test_hmc_pallas.py tests/test_fused_nuts.py tests/test_checkpoint.py tests/test_engine_election.py -q -rs

doctest:
	python -m pytest --doctest-modules littlemcmc_tpu -q

bench:
	python bench.py

baseline:
	python scripts/measure_reference_baseline.py

# Enforced in CI (lint.yml): black --check, pydocstyle, mypy. Locally this
# image has none of them; compileall is the offline floor.
lint:
	python -m compileall -q littlemcmc_tpu tests bench.py __graft_entry__.py
	@command -v black >/dev/null && black --check --line-length 88 littlemcmc_tpu tests bench.py __graft_entry__.py || echo "black not installed (CI runs it)"
	@command -v pydocstyle >/dev/null && pydocstyle littlemcmc_tpu || echo "pydocstyle not installed (CI runs it)"
	@command -v mypy >/dev/null && mypy littlemcmc_tpu || echo "mypy not installed (CI runs it)"

validate:
	python scripts/deep_validation.py

suite:
	python scripts/bench_suite.py

scaling:
	python scripts/scaling_bench.py

parity-pallas:
	python scripts/validate_pallas_parity.py
