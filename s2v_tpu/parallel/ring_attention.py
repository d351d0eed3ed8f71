"""Ring attention: sequence-parallel exact attention over an ICI mesh axis.

The TPU-new capability of this framework (BASELINE.json configs[4],
SURVEY.md §2.5/§5): the 19k-token ``[text | ref | video]`` sequence is
sharded over a ``seq`` mesh axis; each device holds its query shard and
rotates K/V shards around the ring with ``lax.ppermute`` while maintaining
the online-softmax state — communication rides the ICI neighbour links and
overlaps with the per-hop attention compute, memory stays
O(S_local * S_local) per hop instead of O(S^2).

Two per-hop engines:

* ``use_kernel=False`` — plain XLA fp32 einsum per hop; runs anywhere
  (CPU test meshes) and is the parity baseline.
* ``use_kernel=True`` — the Pallas flash kernel per hop
  (``flash_attention(..., return_lse=True)`` with the ring-padding tail
  masked through the kernel's MXU indicator row), hops merged by
  log-sum-exp reweighting.  TPU (or ``interpret=True`` for CPU tests).

See also ``sp_attention.allgather_kv_attention`` — the measured-faster SP
strategy at the flagship geometry (full-extent kernel, one collective per
layer); ring stays the memory-lean option when KV can't be gathered.

Padding contract: the packed sequence is padded to a multiple of the ring
size; padded key positions are masked by *global position* (finite logit),
padded query rows produce garbage that callers slice off — the same
contract as the single-chip flash kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, seq_len, axis_name, scale):
    """Runs on each device under shard_map.

    q/k/v: [B, S_loc, H, d] local shards; ``seq_len``: true (unpadded)
    length.  The K/V shard held at hop r originated on device
    (my_index - r) mod ring, which gives the global key offset for masking.
    """
    b, s_loc, h, d = q.shape
    ring = lax.psum(1, axis_name)

    qf = q.astype(jnp.float32)

    def hop_scores(k_blk):
        return jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32)) * scale

    # initializers must carry the same device-varying type as k/v for the
    # fori_loop carry (shard_map varying-manual-axes typing)
    m0 = lax.pvary(jnp.full((b, h, s_loc), NEG_INF, jnp.float32), axis_name)
    l0 = lax.pvary(jnp.zeros((b, h, s_loc), jnp.float32), axis_name)
    acc0 = lax.pvary(jnp.zeros((b, s_loc, h, d), jnp.float32), axis_name)

    perm = [(i, (i + 1) % ring) for i in range(ring)]

    my_index = lax.axis_index(axis_name)

    def body(r, carry):
        m, l, acc, k_cur, v_cur = carry
        s = hop_scores(k_cur)  # [B, H, Sq, Sk]
        # mask keys past the true sequence length (they exist only on the
        # ring-padded tail shard)
        src = jnp.mod(my_index - r, ring)
        k_pos = src * s_loc + lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(k_pos < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhqk,bkhd->bqhd", p, v_cur.astype(jnp.float32)
        )
        # rotate K/V to the next device
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return m_new, l, acc, k_nxt, v_nxt

    m, l, acc, _, _ = lax.fori_loop(0, ring, body, (m0, l0, acc0, k, v))
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded-query) rows
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def _ring_attention_local_kernel(q, k, v, seq_len, axis_name, scale, interpret):
    """Per-hop Pallas flash kernel + cross-hop log-sum-exp merge.

    Each hop runs the fused kernel over the local K/V shard (ring-padding
    tail masked via the kernel's indicator feature row — MXU-emitted -1e30
    logits, zero VPU cost) and reweights the running output by
    ``exp(lse - lse_new)``.  fp32 merge state; bf16 kernel compute.
    """
    from s2v_tpu.ops.pallas.flash_attention import flash_attention

    b, s_loc, h, d = q.shape
    ring = lax.psum(1, axis_name)
    my_index = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % ring) for i in range(ring)]

    o0 = lax.pvary(jnp.zeros((b, s_loc, h, d), jnp.float32), axis_name)
    lse0 = lax.pvary(jnp.full((b, h, s_loc), NEG_INF, jnp.float32), axis_name)

    def body(r, carry):
        o_acc, lse_acc, k_cur, v_cur = carry
        src = jnp.mod(my_index - r, ring)
        k_pos = src * s_loc + jnp.arange(s_loc, dtype=jnp.int32)
        pad_mask = k_pos >= seq_len  # [S_loc] — ring-padding tail keys
        o_i, lse_i = flash_attention(
            q, k_cur, v_cur, scale=scale, return_lse=True,
            key_pad_mask=pad_mask, interpret=interpret,
        )
        lse_new = jnp.logaddexp(lse_acc, lse_i)  # [B, H, S_loc]
        w_acc = jnp.exp(lse_acc - lse_new).transpose(0, 2, 1)[..., None]
        w_i = jnp.exp(lse_i - lse_new).transpose(0, 2, 1)[..., None]
        o_acc = o_acc * w_acc + o_i.astype(jnp.float32) * w_i
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        return o_acc, lse_new, k_nxt, v_nxt

    o, _, _, _ = lax.fori_loop(0, ring, body, (o0, lse0, k, v))
    return o.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    scale: Optional[float] = None,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact attention with the sequence sharded over ``axis_name``.

    q/k/v: ``[B, S, H, d]`` global arrays (any current sharding); returns
    ``[B, S, H, d]``.  S is padded internally to a multiple of the ring size.
    ``use_kernel=None`` auto-selects the Pallas per-hop engine on TPU.
    """
    from jax import shard_map

    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    ring = mesh.shape[axis_name]
    pad = (-s) % ring
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    s_pad = s + pad

    if use_kernel:
        local = functools.partial(
            _ring_attention_local_kernel,
            seq_len=s, axis_name=axis_name, scale=scale, interpret=interpret,
        )
    else:
        local = functools.partial(
            _ring_attention_local, seq_len=s, axis_name=axis_name, scale=scale
        )
    spec = P(None, axis_name, None, None)
    # check_vma=False on the kernel path: the Pallas call's out_shape
    # carries no varying-manual-axes annotation (mesh-agnostic by design)
    fn = shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=not use_kernel,
    )
    out = jax.jit(fn)(q, k, v)
    return out[:, :s]


def _ring_local_fn(seq_len, axis_name, scale):
    """Expose the shard-local body for composition inside larger
    shard_map'ped programs (e.g. a fully sequence-parallel DiT block)."""
    return functools.partial(
        _ring_attention_local, seq_len=seq_len, axis_name=axis_name, scale=scale
    )
