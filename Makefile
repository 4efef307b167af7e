# Development tasks for biahub-tpu (reference pattern: Makefile)

.PHONY: setup test bench lint check-examples

setup:
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# Matches .github/workflows/pull-request-ci.yml's lint job; falls back to a
# bytecode compile check where ruff is not installed.
lint:
	@command -v ruff >/dev/null 2>&1 \
		&& (ruff check . && ruff format --check .) \
		|| python -m compileall -q biahub_tpu

check-examples:
	python -m pytest tests/test_example_settings.py -q
