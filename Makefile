# Developer entry points

.PHONY: test test-fast bench native demo dryrun clean

test:
	python -m pytest tests/ -q

# smoke tier: <1 min on CPU (kernels/ops/loaders/scheduler/tokenizers);
# the jit-heavy modules carry pytest.mark.slow
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

native:
	$(MAKE) -C native

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache s2v_tpu/**/__pycache__
