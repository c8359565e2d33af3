# Convenience targets (the reference ships Makefile+CMake; here the Python
# package needs no build, and the native ingest library builds on demand).

.PHONY: all native test bench clean

all: native

native: native/libcrt_ingest.so

native/libcrt_ingest.so: native/ingest.cpp
	g++ -O3 -std=c++17 -shared -fPIC $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f native/libcrt_ingest.so
