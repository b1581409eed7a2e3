# Developer entry points (parity: reference Makefile:88-141,216-231)

PY ?= python

.PHONY: test test-fast test-integration bench experiments examples lint \
	clean paper notebook

test:            ## full suite (CPU, 8 virtual devices)
	$(PY) -m pytest tests/ -q

test-fast:       ## unit tests only
	$(PY) -m pytest tests/unit -q

test-integration:
	$(PY) -m pytest tests/integration -q

bench:           ## flagship TPU benchmark (one JSON line)
	$(PY) bench.py

experiments:     ## quick experiment sweep on CPU
	$(PY) -m lattice_gaussian_mcmc_tpu.experiments.cli --quick --cpu \
	    --output-dir results

examples:
	$(PY) examples/quickstart.py --cpu
	$(PY) examples/ntru_falcon.py --cpu --n 32

reduce-lib:      ## build the native reduction library explicitly
	g++ -O3 -march=native -shared -fPIC \
	    -o lattice_gaussian_mcmc_tpu/reduction/cpp/liblattice_reduce.so \
	    lattice_gaussian_mcmc_tpu/reduction/cpp/lattice_reduce.cpp

paper:           ## build paper/main.pdf (pdflatex if present, else preview)
	@if command -v pdflatex >/dev/null 2>&1; then \
	    cd paper && pdflatex -interaction=nonstopmode main.tex && \
	    pdflatex -interaction=nonstopmode main.tex; \
	else \
	    $(PY) paper/build_preview.py; \
	fi

notebook:        ## execute the quickstart notebook top-to-bottom (CPU)
	$(PY) -m jupyter nbconvert --to notebook --execute --inplace \
	    notebooks/quickstart.ipynb

clean:
	rm -rf .pytest_cache results
	find . -name __pycache__ -type d -exec rm -rf {} +
