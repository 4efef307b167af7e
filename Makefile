# Development tasks for biahub-tpu (reference pattern: Makefile)

.PHONY: setup test bench lint check-examples

setup:
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -q

bench:
	python bench.py

lint:
	python -m compileall -q biahub_tpu

check-examples:
	python -m pytest tests/test_example_settings.py -q
