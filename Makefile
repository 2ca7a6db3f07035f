# Build / test / bench entry points (≈ the reference's compile.m, which
# drives nvcc + mex; here: g++ for the native planner, pytest, bench).

CSRC := csrc
SO   := $(CSRC)/libfftconv_planner.so

.PHONY: all native test test-tpu bench demo clean

all: native

native: $(SO)

$(SO): $(CSRC)/planner.cpp
	g++ -O2 -shared -fPIC -std=c++17 -o $@ $<

test:
	python -m pytest tests/ -q

# run the suite on the attached TPU instead of the simulated CPU mesh
test-tpu:
	FFTCONV_TEST_TPU=1 python -m pytest tests/ -q

bench:
	python bench.py

demo:
	python examples/demo.py
	python examples/demo_bank.py
	python examples/demo_dpm.py
	python examples/demo_train.py
	python examples/demo_serving.py

clean:
	rm -f $(SO)
	find . -name __pycache__ -type d -exec rm -rf {} +
