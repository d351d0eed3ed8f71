"""On-chip flash-attention kernel sweep: softmax mode x block sizes x batch.

Measures the jitted end-to-end `flash_attention` (relayout + aug building +
kernel — exactly what serving pays per layer) at the flagship geometry
S=19,126, H=48, d=64, comparing the classic online-softmax kernel against
the bounded-softmax kernel (VERDICT r3 #1: no online-max recurrence; the
-M0 offset and pad mask ride one MXU feature row, per-step VPU work is one
exp).  Emits bench_runs/flash_sweep.json.

Timing: each config is timed by chaining ITERS async dispatches and
fetching ONE scalar at the end — a per-call fetch through the axon relay
adds ~27 ms and understates throughput.  Effective TF/s counts useful
FLOPs only: 4 * B*H*S^2*d (QK + PV, MACs x2).

Run on the real chip: `python tools/bench_flash_sweep.py`.
`S2V_FLASH_SWEEP_SMOKE=1` runs a tiny CPU-interpret pass of the whole flow.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = bool(os.environ.get("S2V_FLASH_SWEEP_SMOKE"))
JSON_OUT = os.environ.get(
    "S2V_FLASH_SWEEP_JSON", os.path.join(REPO, "bench_runs", "flash_sweep.json")
)


def main():
    if not SMOKE:
        from s2v_tpu.cli_utils import probe_backend

        result = probe_backend(int(os.environ.get("S2V_BENCH_INIT_TIMEOUT", "120")))
        if "devices" not in result:
            print(f"# FATAL: backend init failed/timed out: {result}", flush=True)
            os._exit(2)

    import jax
    import jax.numpy as jnp

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from s2v_tpu.ops.pallas.flash_attention import flash_attention

    if SMOKE:
        S, H, D = 256, 2, 64
        batches = (1,)
        grid = [(128, 128)]
        iters, warmup = 1, 1
    else:
        S, H, D = 19126, 48, 64
        batches = (1, 2)
        # (1024, 4096) and (2048, *) crash the Mosaic compile helper (VMEM):
        # bench_runs/flash_sweep.json keeps the error rows
        grid = [(512, 512), (512, 1024), (512, 2048), (1024, 1024),
                (1024, 1536), (1024, 2048)]
        iters, warmup = 8, 2

    results = []

    def _flush():
        os.makedirs(os.path.dirname(JSON_OUT), exist_ok=True)
        with open(JSON_OUT, "w") as f:
            json.dump({"geometry": f"S={S} H={H} d={D}",
                       "method": "chained async dispatches, one fetch",
                       "runs": results}, f, indent=1)

    for B in batches:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
        jax.block_until_ready((q, k, v))
        flops = 4.0 * B * H * S * S * D
        for mode in ("online", "bounded", "bounded_exp2"):
            for bq, bk in grid:
                name = f"B={B} {mode} bq={bq} bk={bk}"
                try:
                    fn = lambda: flash_attention(
                        q, k, v, block_q=bq, block_k=bk,
                        interpret=SMOKE, softmax_mode=mode,
                    )

                    def _fetch(o):
                        # the axon relay's block_until_ready returns before
                        # execution completes — force a real device->host
                        # scalar fetch (device queue is in-order, so the
                        # last result's scalar implies all prior dispatches
                        # finished); one fetch costs ~27 ms, amortized
                        return float(jnp.sum(o[0, :2, 0, 0]))

                    for _ in range(warmup):
                        out = fn()
                    _fetch(out)
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        out = fn()
                    _fetch(out)
                    dt = (time.perf_counter() - t0) / iters
                    row = {"name": name, "ms": round(dt * 1e3, 2),
                           "tflops_eff": round(flops / dt / 1e12, 1)}
                except Exception as e:
                    row = {"name": name, "error": f"{type(e).__name__}: {e}"[:200]}
                results.append(row)
                _flush()
                print(f"# {row}", flush=True)
        del q, k, v
        jax.clear_caches()

    best = max((r for r in results if "tflops_eff" in r),
               key=lambda r: r["tflops_eff"], default=None)
    print(json.dumps({"best": best, "out": JSON_OUT}))


if __name__ == "__main__":
    main()
