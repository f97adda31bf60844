# Convenience targets; everything also works without make.

.PHONY: native test test-all test-fast bench stream dryrun clean

native:
	g++ -O3 -march=native -funroll-loops -shared -fPIC \
	    -o mydetection_tpu/native/libimagepipe.so \
	    mydetection_tpu/native/imagepipe.cpp -ljpeg

test:  # default: excludes @slow (see pyproject addopts)
	python -m pytest tests/ -q

test-all:  # everything, including @slow overfit + sharding subprocess
	python -m pytest tests/ -q -m "slow or not slow"

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_scripts.py \
	    --ignore=tests/test_sharding.py

bench:
	python bench.py

stream:
	python benchmarks/streaming.py

dryrun:
	python __graft_entry__.py 8

clean:
	rm -f mydetection_tpu/native/libimagepipe.so
	find . -name __pycache__ -type d -exec rm -rf {} +
