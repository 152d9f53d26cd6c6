# Convenience targets (the package itself needs no build step: the C++
# scanner compiles on demand into a content-hashed cache at import time).

PY ?= python

.PHONY: test test-fast scanner sanitize bench reference clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

# force a fresh scanner build (e.g. after editing _scan.cpp)
scanner:
	rm -rf libacm_tpu/scan/_build
	$(PY) -c "from libacm_tpu.scan import native; assert native.available()"

sanitize:
	$(PY) -m pytest tests/test_sanitizer.py -q

bench:
	$(PY) bench.py

# build the C reference out-of-tree for live-diff tests / baseline
reference:
	mkdir -p /tmp/refbuild/src
	gcc -O2 -o /tmp/refbuild/src/acmtool -I /root/reference/src \
	  /root/reference/src/decode.c /root/reference/src/util.c \
	  /root/reference/src/acmtool.c

clean:
	rm -rf libacm_tpu/scan/_build build dist *.egg-info
	find . -name __pycache__ -type d -exec rm -rf {} +
