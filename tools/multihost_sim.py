"""Two-process jax.distributed simulation (multi-host evidence, VERDICT r1 #7).

Each process owns 4 virtual CPU devices (= one "host" of a 2-host pod);
``initialize_distributed`` bootstraps the coordination service and
``make_hybrid_mesh({"data": 2}, {"model": 4})`` lays the data axis across
processes (DCN) and the model axis within each process (ICI).  A TP-sharded
tiny denoise step then runs with *real cross-process collectives* and is
checked against the process-local single-device result.

Launched by tests/test_multihost.py (or by hand):

    python tools/multihost_sim.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(process_id: int, num_processes: int, port: int) -> None:
    os.environ.setdefault("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    from s2v_tpu.parallel.multihost import initialize_distributed, make_hybrid_mesh

    ok = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert ok, "expected a multi-process runtime"
    assert jax.process_count() == num_processes
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == num_processes * n_local, (n_global, n_local)

    import jax.numpy as jnp
    import numpy as np

    from s2v_tpu.config import SchedulerConfig, TransformerConfig
    from s2v_tpu.models.transformer import init_transformer_params_stacked
    from s2v_tpu.parallel import (
        default_logical_map,
        mesh_context,
        shard_params,
        transformer_param_specs,
    )
    from s2v_tpu.pipelines.denoise import DenoiseSchedule, denoise
    from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed

    cfg = TransformerConfig.tiny()
    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    B, F, H, W = 2, 2, 8, 8  # batch 2 -> dp=2 over DCN
    key = jax.random.PRNGKey(1)
    lat = jax.random.normal(key, (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), jnp.float32)
    emb = jax.random.normal(key, (2 * B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32)
    gh, gw = H // 2, W // 2
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, ((0, 0), (gh, gw)), (gh, gw), F + 1)
    tok = gh * gw
    cs, sn = build_segmented_rope(
        cfg.max_text_seq_length, cos[:tok], sin[:tok], cos[tok : tok * (F + 1)], sin[tok : tok * (F + 1)]
    )
    sched = DenoiseSchedule.create(SchedulerConfig(), 1, 6.0)

    # reference: process-local single-device run (identical host inputs)
    expected = denoise(params, cfg, sched, lat, ref, emb, cs, sn, do_cfg=True)
    expected_mean = float(jnp.mean(jnp.abs(expected.astype(jnp.float32))))

    # DCN data axis across the 2 processes, ICI model axis within each
    mesh = make_hybrid_mesh({"data": num_processes}, {"model": n_local})
    assert {d.process_index for d in mesh.devices[0].ravel()} == {0}, (
        "ICI (model) axis must stay within one process granule"
    )
    sharded = shard_params(params, mesh, transformer_param_specs(cfg, "model"))
    with mesh_context(mesh, default_logical_map(mesh)):
        fn = jax.jit(
            lambda p, l, r, e: jnp.mean(
                jnp.abs(denoise(p, cfg, sched, l, r, e, cs, sn, do_cfg=True).astype(jnp.float32))
            )
        )
        got_mean = float(fn(sharded, lat, ref, emb))

    diff = abs(got_mean - expected_mean)
    assert diff < 1e-5 * max(expected_mean, 1.0), (got_mean, expected_mean)
    print(
        f"MULTIHOST OK: proc {process_id}/{num_processes}, "
        f"{n_global} global devices, mesh data{num_processes} (DCN) x "
        f"model{n_local} (ICI), |mean diff| = {diff:.2e}",
        flush=True,
    )

    # phase 2: FSDP full fine-tune step ACROSS the process boundary —
    # fp32 master + adam moments sharded 1/num_processes over the DCN
    # data axis, weight all-gathers and grad reduce-scatters crossing the
    # coordination service (training/full.py on a real multi-host mesh)
    from s2v_tpu.training.full import make_full_train_step
    from s2v_tpu.training.optim import OptimizerSpec

    prep, init_opt, train_step = make_full_train_step(
        cfg, SchedulerConfig(), OptimizerSpec(learning_rate=1e-3),
        mesh=mesh, fsdp_min_size=64,
    )
    fparams = prep(jax.tree.map(lambda x: np.asarray(x, np.float32), params))
    fopt = init_opt(fparams)
    batch = {
        "video_latents": lat,
        "ref_latents": ref,
        "text_embeds": emb[:B],
        "rope_cos": cs,
        "rope_sin": sn,
    }
    with mesh_context(mesh, default_logical_map(mesh)):
        fparams, fopt, loss = train_step(fparams, fopt, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss)), float(loss)
    qkv = fparams["blocks"]["attn"]["qkv"]["kernel"]
    # the hybrid mesh has BOTH axes, so combined FSDP x TP specs shard the
    # qkv kernel over data (DCN, across processes) AND model (ICI): each
    # device holds 1/(num_processes * n_local)
    n_shard = num_processes * n_local
    for sh in qkv.addressable_shards:
        assert sh.data.size == qkv.size // n_shard, (
            sh.data.size, qkv.size, n_shard,
        )
    print(
        f"MULTIHOST FSDP OK: proc {process_id}/{num_processes}, full-FT "
        f"step with state sharded 1/{n_shard} (FSDP over DCN x TP over "
        f"ICI), loss={float(loss):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
