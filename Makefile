# Developer entry points.
#
# Tests run hermetically on CPU: PALLAS_AXON_POOL_IPS is cleared so the
# interpreter never dials the TPU relay (sitecustomize registers the axon
# PJRT plugin at startup otherwise), and JAX_PLATFORMS=cpu with 8 virtual
# devices exercises the multi-chip sharding paths.
TEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test bench native clean

test:
	$(TEST_ENV) python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
