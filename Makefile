# Developer targets (reference Makefile role).
.PHONY: test test-fast bench native serve train theory baselines profile sweep clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

native:
	./native/build.sh

serve:
	python scripts/serve.py --mock

train:
	python scripts/train_predictor.py

theory:
	python scripts/theory_demo.py

baselines:
	python scripts/run_baselines.py

profile:
	python scripts/profile_costs.py --mock

sweep:
	python scripts/evaluate.py

clean:
	rm -rf .pytest_cache **/__pycache__ native/libasd_native.so
