"""HLO collective inspection for the sharded programs (VERDICT r3 #4).

Compiles the real denoise-step / train-step programs for each mesh shape in
the SCALING table and asserts on the collectives GSPMD inserted:

  * TP inference: activations are psum'd (all-reduce present), but NO
    all-gather materializes a full weight matrix — an accidental
    full-tree gather is the classic way a "sharded" program silently
    replicates its parameters and blows the per-chip memory model that
    docs/SCALING.md's projections rest on.
  * FSDP training: parameters ARE all-gathered per layer (that is the
    algorithm) and gradients reduce-scattered — both must be present.

Shape parsing keys off the HLO text; thresholds are in ELEMENTS so the
assertions hold at any dtype.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2v_tpu.config import SchedulerConfig, TransformerConfig
from s2v_tpu.models.transformer import init_transformer_params_stacked, transformer_forward
from s2v_tpu.parallel import (
    default_logical_map,
    make_mesh,
    mesh_context,
    shard_params,
    transformer_param_specs,
)
from s2v_tpu.ops.rope import build_segmented_rope, get_3d_rotary_pos_embed

pytestmark = pytest.mark.slow


def _collective_shapes(hlo_text: str, op: str):
    """All result shapes of `op` ops in the HLO, as element counts.

    Matches lines like ``%all-gather.3 = f32[2,16,64]{...} all-gather(...``
    including tuple results.
    """
    counts = []
    for m in re.finditer(
        rf"= \(?((?:[a-z0-9]+\[[0-9,]*\][^ ]* ?,? ?)+)\)? {re.escape(op)}\(", hlo_text
    ):
        for shape in re.findall(r"\[([0-9,]*)\]", m.group(1)):
            dims = [int(d) for d in shape.split(",") if d]
            counts.append(int(np.prod(dims)) if dims else 1)
    return counts


def _tiny_inputs(cfg, B=2):
    F, H, W = 2, 8, 8
    key = jax.random.PRNGKey(1)
    video = jax.random.normal(key, (B, F, H, W, cfg.in_channels), jnp.float32)
    ref = jax.random.normal(key, (B, 1, H, W, cfg.in_channels), jnp.float32)
    text = jax.random.normal(
        key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32
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
    return video, ref, text, t, cs, sn


@pytest.mark.parametrize("axes", [{"model": 4, "data": 2}, {"model": 8}])
def test_tp_step_has_psums_but_never_gathers_weights(axes):
    cfg = TransformerConfig.tiny()
    mesh = make_mesh(axes)
    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh, transformer_param_specs(cfg, "model"))
    video, ref, text, t, cs, sn = _tiny_inputs(cfg)

    def fwd(p, v, r, te, ts):
        return transformer_forward(p, cfg, v, r, te, ts, cs, sn)

    with mesh_context(mesh, default_logical_map(mesh)):
        compiled = jax.jit(fwd).lower(params, video, ref, text, t).compile()
    hlo = compiled.as_text()

    all_reduces = _collective_shapes(hlo, "all-reduce")
    assert all_reduces, "TP forward must psum row-parallel partials"

    # largest weight SHARD living on a device under this mesh: the stacked
    # ff net_0 kernel [L, D, 4D] / tp.  An all-gather result at or above
    # the UNSHARDED stacked kernel size means GSPMD re-materialized full
    # weights.
    tp = axes["model"]
    full_ff = cfg.num_layers * cfg.inner_dim * 4 * cfg.inner_dim
    gathers = _collective_shapes(hlo, "all-gather")
    offenders = [g for g in gathers if g >= full_ff]
    assert not offenders, (
        f"all-gather materializes >= a full stacked weight ({offenders} elems, "
        f"full ff = {full_ff}); params must stay 1/{tp}-sharded"
    )


def test_fsdp_step_gathers_params_and_reduce_scatters_grads():
    from s2v_tpu.training.full import make_full_train_step
    from s2v_tpu.training.optim import OptimizerSpec

    cfg = TransformerConfig.tiny()
    n = 8
    mesh = make_mesh({"data": n})
    params = init_transformer_params_stacked(jax.random.PRNGKey(0), cfg)
    master = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    prep, init_opt, step = make_full_train_step(
        cfg, SchedulerConfig(), OptimizerSpec(learning_rate=1e-3),
        mesh=mesh, fsdp_min_size=64,
    )
    fparams = prep(master)
    fopt = init_opt(fparams)
    video, ref, text, t, cs, sn = _tiny_inputs(cfg, B=n)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    batch = {
        "video_latents": jax.device_put(video, sh),
        "ref_latents": jax.device_put(ref, sh),
        "text_embeds": jax.device_put(text, sh),
        "rope_cos": cs,
        "rope_sin": sn,
    }
    compiled = jax.jit(step).lower(fparams, fopt, batch, jax.random.PRNGKey(4)).compile()
    hlo = compiled.as_text()
    assert _collective_shapes(hlo, "all-gather"), "FSDP must gather sharded params"
    has_rs = bool(_collective_shapes(hlo, "reduce-scatter"))
    # XLA may lower grad reduce-scatter as all-reduce + dynamic-slice on
    # CPU; accept either, but SOME cross-device grad reduction must exist
    assert has_rs or _collective_shapes(hlo, "all-reduce"), (
        "FSDP must reduce gradients across the data axis"
    )
