# Developer entry points

.PHONY: test test-fast test-heavy bench native demo dryrun parity clean

# default full tier (~35 min on a 1-CPU host; multi-minute production-dim
# tests live in the opt-in heavy tier — see pyproject [tool.pytest.ini_options])
test:
	python -m pytest tests/ -q

# smoke tier: <1 min on CPU (kernels/ops/loaders/scheduler/tokenizers);
# the jit-heavy modules carry pytest.mark.slow
test-fast:
	python -m pytest tests/ -q -m "not slow"

# heavy tier: production-dim parity (42-block full-scale, real key
# inventories) + e2e subprocess drives (~60 min); run per-release or when
# loaders/models/cli change
test-heavy:
	python -m pytest tests/ -q -m heavy

bench:
	python bench.py

native:
	$(MAKE) -C native

# real-weight parity: the moment a checkpoint + reference dump are
# available the north-star PSNR number is one command away, e.g.
#   make parity MODEL_DIR=/ckpts/CogVideoX-5b LORA_DIR=/ckpts/s2v_lora DUMP=ref_dump.safetensors
# (dump key contract: tools/parity_dump.py docstring; emits per-stage
# drift + PSNR vs frames::final)
parity:
	python tools/parity_dump.py --model_dir $(MODEL_DIR) \
		$(if $(LORA_DIR),--lora_dir $(LORA_DIR)) --reference_dump $(DUMP)

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache s2v_tpu/**/__pycache__
