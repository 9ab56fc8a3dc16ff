# Developer entry points.
#
# Tests run hermetically on CPU: PALLAS_AXON_POOL_IPS is cleared so the
# interpreter never dials the TPU relay (sitecustomize registers the axon
# PJRT plugin at startup otherwise), and JAX_PLATFORMS=cpu with 8 virtual
# devices exercises the multi-chip sharding paths.
TEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-device bench bench-cli profile native clean

test:
	$(TEST_ENV) python -m pytest tests/ -x -q

# run the suite against the real accelerator (mel bit-parity on device etc.)
test-device:
	EMOTTS_TEST_DEVICE=1 python -m pytest tests/test_audio_mel.py -q

bench:
	python bench.py

# full user path: checkpoint load + G2P + sweep + host wav transfer
bench-cli:
	python bench.py --cli-path

# per-stage vocoder decomposition + training throughput on the device
profile:
	python benchmarks/vocoder_profile.py
	python benchmarks/train_bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
