.PHONY: test test-fast bench baseline lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not recovery and not parity"

bench:
	python bench.py

baseline:
	python scripts/measure_reference_baseline.py

lint:
	python -m compileall -q littlemcmc_tpu tests bench.py __graft_entry__.py

validate:
	python scripts/deep_validation.py

suite:
	python scripts/bench_suite.py

scaling:
	python scripts/scaling_bench.py

parity-pallas:
	python scripts/validate_pallas_parity.py
