"""Pod-day checklist, executable (VERDICT r3 #4).

docs/SCALING.md's "What must be validated on first pod access" list as ONE
unattended script: run this on the first real multi-chip slice and it
measures, in order, everything the v5e-64 projection rests on, writing
bench_runs/pod_day.json as it goes (resumable artifact — a killed run
keeps every stage measured so far).

Stages (each skipped with a reason if its preconditions are missing):

  1. topology        — devices, slice shape, ICI-vs-DCN axis report
  2. pad16           — tools/bench_sp.py at r=16: the modelled pad(16)=1.30
                       efficiency factor (SCALING.md's top-listed risk)
  3. ag_overlap      — AG-KV attention with and without a fused consumer:
                       how much of the all-gather XLA actually hides
  4. cp_vae          — context-parallel VAE decode first-chunk cost +
                       fixed-cost total (the model's ~3 s)
  5. turbo_stack     — turbo knobs on a SHARDED denoise step (multiplicative
                       stacking was only ever measured single-chip)
  6. dit_step        — the flagship sharded denoise step time itself, the
                       number the whole SCALING table predicts

On a CPU host (no pod) every stage still *compiles and runs* at tiny dims
over the virtual 8-device mesh (S2V_POD_DAY_SMOKE=1 forces this), so the
script itself is CI-covered and cannot rot before pod day.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = bool(os.environ.get("S2V_POD_DAY_SMOKE"))
JSON_OUT = os.environ.get(
    "S2V_POD_DAY_JSON", os.path.join(REPO, "bench_runs", "pod_day.json")
)


class _Skip(Exception):
    pass


def main():
    if SMOKE:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from s2v_tpu.config import TransformerConfig
    from s2v_tpu.models.transformer import (
        init_transformer_params_stacked,
        transformer_forward,
    )
    from s2v_tpu.parallel import (
        default_logical_map,
        make_mesh,
        mesh_context,
        shard_params,
        transformer_param_specs,
    )
    from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed

    # S2V_POD_DAY_STAGES="topology,dit_step" restricts the run (CI smoke)
    only = {
        s.strip() for s in os.environ.get("S2V_POD_DAY_STAGES", "").split(",") if s.strip()
    }

    def want(name):
        return not only or name in only

    stages = {}

    def record(name, **kv):
        stages[name] = kv
        os.makedirs(os.path.dirname(JSON_OUT), exist_ok=True)
        with open(JSON_OUT, "w") as f:
            json.dump({"smoke": SMOKE, "stages": stages}, f, indent=1)
        print(f"# pod_day {name}: {kv}", flush=True)

    devs = jax.devices()
    n = len(devs)
    record(
        "topology",
        n_devices=n,
        platform=devs[0].platform,
        kinds=sorted({d.device_kind for d in devs}),
        processes=jax.process_count(),
    )

    # ---- stage 2: pad16 (r=16 SP shard efficiency)
    if want("pad16"):
        r16 = 16 if n >= 16 else n
        env = dict(os.environ, S2V_BENCH_SP_RING=str(r16))
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "bench_sp.py")],
                capture_output=True, text=True, timeout=1800, env=env,
            )
            tail = (out.stdout or "").strip().splitlines()[-3:]
            record("pad16", ring=r16, rc=out.returncode, tail=tail)
        except Exception as e:
            record("pad16", skipped=f"{type(e).__name__}: {e}"[:200])

    # ---- shared tiny/flagship setup for stages 3-6
    if SMOKE or devs[0].platform == "cpu":
        cfg = TransformerConfig.tiny()
        B, F, H, W = 2, 2, 8, 8
        backend = "xla"
    else:
        cfg = TransformerConfig.cogvideox_5b()
        B, F, H, W = 2, 13, 60, 90
        backend = "sp_allgather"
    sp = max(d for d in (n, n // 2, 1) if d and cfg.num_attention_heads % d == 0) or 1
    mesh_axes = {"seq": sp} if sp == n else {"data": n // sp, "seq": sp}
    mesh = make_mesh(mesh_axes)

    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    if "model" in mesh.axis_names:
        params = shard_params(params, mesh, transformer_param_specs(cfg, "model"))
    key = jax.random.PRNGKey(1)
    video = jax.random.normal(key, (B, F, H, W, cfg.in_channels), cfg.dtype)
    ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), cfg.dtype)
    text = jax.random.normal(
        key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), cfg.dtype
    )
    t = jnp.full((B,), 999, jnp.int32)
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(
        cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1
    )
    tok = gh * gw
    cs, sn = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok],
        cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)],
    )

    def timed(fn, *args, iters=3):
        o = fn(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        jax.block_until_ready(o)
        # force a real fetch (axon relay: block_until_ready can return early)
        float(jnp.asarray(jax.tree.leaves(o)[0]).reshape(-1)[0])
        return (time.perf_counter() - t0) / iters

    # ---- stage 3: AG overlap — sp_allgather attention step vs xla
    be = "sp_allgather" if sp > 1 else backend

    def step(p, v, r, te, ts, backend_):
        return transformer_forward(
            p, cfg, v, r, te, ts, cs, sn, attention_backend=backend_
        ).astype(jnp.float32).sum()

    try:
        if not want("ag_overlap"):
            raise _Skip
        with mesh_context(mesh, default_logical_map(mesh)):
            dt_sp = timed(jax.jit(lambda *a: step(*a, be)), params, video, ref, text, t)
            dt_x = timed(jax.jit(lambda *a: step(*a, "xla")), params, video, ref, text, t)
        record("ag_overlap", mesh=str(mesh_axes), sp_backend_s=round(dt_sp, 4),
               xla_baseline_s=round(dt_x, 4),
               exposed_frac=round(max(dt_sp - dt_x, 0.0) / max(dt_x, 1e-9), 3))
    except _Skip:
        pass
    except Exception as e:
        record("ag_overlap", skipped=f"{type(e).__name__}: {e}"[:200])

    # ---- stage 4: CP-VAE decode
    try:
        if not want("cp_vae"):
            raise _Skip
        from s2v_tpu.testing import tiny_generate_kwargs, tiny_pipeline as build

        pipe = build()
        tc = pipe.vae_cfg.temporal_compression_ratio
        pipe.set_mesh({"seq": n})
        kw = tiny_generate_kwargs(
            pipe, num_inference_steps=1, num_frames=(n - 1) * tc + 1,
            output_type="latent",
        )
        lat = pipe.generate(**kw)
        t0 = time.perf_counter()
        frames = pipe.decode_latents(lat)
        dt = time.perf_counter() - t0
        record("cp_vae", n_cp=n, decode_s=round(dt, 3),
               out_shape=list(np.asarray(frames).shape))
    except _Skip:
        pass
    except Exception as e:
        record("cp_vae", skipped=f"{type(e).__name__}: {e}"[:200])

    # ---- stage 5: turbo stacking on the sharded step
    try:
        if not want("turbo_stack"):
            raise _Skip
        import dataclasses

        wcfg = dataclasses.replace(cfg, attention_window_frames=1)
        wbe = "sp_windowed" if sp > 1 and not SMOKE else ("windowed_xla" if SMOKE else "windowed")

        def wstep(p, v, r, te, ts):
            return transformer_forward(
                p, wcfg, v, r, te, ts, cs, sn, attention_backend=wbe
            ).astype(jnp.float32).sum()

        with mesh_context(mesh, default_logical_map(mesh)):
            dt_w = timed(jax.jit(wstep), params, video, ref, text, t)
        base = stages.get("ag_overlap", {}).get("sp_backend_s")
        record("turbo_stack", windowed_backend=wbe, windowed_step_s=round(dt_w, 4),
               speedup_vs_exact=(round(base / dt_w, 2) if base else None))
    except _Skip:
        pass
    except Exception as e:
        record("turbo_stack", skipped=f"{type(e).__name__}: {e}"[:200])

    # ---- stage 6: the flagship sharded DiT step (the SCALING table's y-axis)
    try:
        if not want("dit_step"):
            raise _Skip
        with mesh_context(mesh, default_logical_map(mesh)):
            dt = timed(
                jax.jit(lambda *a: step(*a, be)), params, video, ref, text, t
            )
        record("dit_step", mesh=str(mesh_axes), step_s=round(dt, 4),
               note="batched-CFG forward; x steps for the denoise total")
    except _Skip:
        pass
    except Exception as e:
        record("dit_step", skipped=f"{type(e).__name__}: {e}"[:200])

    print(json.dumps({"out": JSON_OUT, "stages": list(stages)}))


if __name__ == "__main__":
    main()
