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


def _ring_attention_local(q, k, v, seq_len, axis_name, scale, return_lse=False):
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
    if return_lse:
        return out.astype(q.dtype), m + jnp.log(l)
    return out.astype(q.dtype)


def _ring_attention_local_kernel(q, k, v, seq_len, axis_name, scale, interpret,
                                 return_lse=False):
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

    o, lse, _, _ = lax.fori_loop(0, ring, body, (o0, lse0, k, v))
    if return_lse:
        return o.astype(q.dtype), lse
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
    return_lse: bool = False,
) -> jnp.ndarray:
    """Exact attention with the sequence sharded over ``axis_name``.

    q/k/v: ``[B, S, H, d]`` global arrays (any current sharding); returns
    ``[B, S, H, d]``.  S is padded internally to a multiple of the ring size.
    ``use_kernel=None`` auto-selects the Pallas per-hop engine on TPU.
    ``return_lse=True`` also returns the per-row log-sum-exp ``[B, H, S]``
    (the residual for :func:`ring_attention_trainable`'s backward pass).
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
            return_lse=return_lse,
        )
    else:
        local = functools.partial(
            _ring_attention_local, seq_len=s, axis_name=axis_name, scale=scale,
            return_lse=return_lse,
        )
    spec = P(None, axis_name, None, None)
    out_specs = (spec, P(None, None, axis_name)) if return_lse else spec
    # check_vma=False on the kernel path: the Pallas call's out_shape
    # carries no varying-manual-axes annotation (mesh-agnostic by design)
    fn = shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=out_specs,
        check_vma=not use_kernel,
    )
    out = jax.jit(fn)(q, k, v)
    if return_lse:
        o, lse = out
        return o[:, :s], lse[..., :s]
    return out[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def ring_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    scale: Optional[float] = None,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable ring attention: a second ring pass for the backward.

    The backward rotates ``(k, v, dk_acc, dv_acc)`` together around the
    ring; at each hop every device recomputes its queries' probabilities
    against the held K block from the forward's global log-sum-exp
    (``p = exp(qk - lse)`` — already globally normalized, so hop grads sum
    exactly), accumulates ``dq += (p*(dp - D)) K`` locally and
    ``dk/dv += (.)`` into the rotating accumulators, which arrive back at
    their owner after the full ring.  Per-hop math is fp32 XLA einsums
    (O(S_loc^2) memory — ring is the memory-lean fallback; the AG-KV and
    Ulysses paths own the fast training cases with Pallas both ways).
    """
    return ring_attention(
        q, k, v, mesh, axis_name, scale=scale, use_kernel=use_kernel,
        interpret=interpret,
    )


def _ring_bwd_local(q, k, v, g, lse, d_row, seq_len, axis_name, scale):
    """Second ring pass (runs under shard_map): returns (dq, dk, dv)
    local shards.  ``lse``/``d_row``: [B, H, S_loc] forward residuals."""
    b, s_loc, h, d = q.shape
    ring = lax.psum(1, axis_name)
    my_index = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % ring) for i in range(ring)]

    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    dq0 = lax.pvary(jnp.zeros((b, s_loc, h, d), jnp.float32), axis_name)
    dk0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
    dv0 = jnp.zeros((b, s_loc, h, d), jnp.float32)

    def body(r, carry):
        dq, k_cur, v_cur, dk_cur, dv_cur = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_cur.astype(jnp.float32)) * scale
        src = jnp.mod(my_index - r, ring)
        k_pos = src * s_loc + lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(k_pos < seq_len, s, NEG_INF)
        p = jnp.exp(s - lse[..., None])  # globally-normalized probabilities
        dp = jnp.einsum("bqhd,bkhd->bhqk", gf, v_cur.astype(jnp.float32))
        ds = p * (dp - d_row[..., None])  # [B, H, Sq, Sk]
        dq = dq + jnp.einsum("bhqk,bkhd->bqhd", ds, k_cur.astype(jnp.float32)) * scale
        dk_cur = dk_cur + jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * scale
        dv_cur = dv_cur + jnp.einsum("bhqk,bqhd->bkhd", p, gf)
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        dk_nxt = lax.ppermute(dk_cur, axis_name, perm)
        dv_nxt = lax.ppermute(dv_cur, axis_name, perm)
        return dq, k_nxt, v_nxt, dk_nxt, dv_nxt

    dq, _, _, dk, dv = lax.fori_loop(
        0, ring, body,
        (dq0, k, v, lax.pvary(dk0, axis_name), lax.pvary(dv0, axis_name)),
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _rat_fwd(q, k, v, mesh, axis_name, scale, use_kernel, interpret):
    o, lse = ring_attention(
        q, k, v, mesh, axis_name, scale=scale, use_kernel=use_kernel,
        interpret=interpret, return_lse=True,
    )
    return o, (q, k, v, o, lse)


def _rat_bwd(mesh, axis_name, scale, use_kernel, interpret, residuals, g):
    from jax import shard_map

    q, k, v, o, lse = residuals
    b, s, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ring = mesh.shape[axis_name]
    pad = (-s) % ring
    g = g.astype(q.dtype)
    # D = rowsum(dO * O), computed on the unpadded arrays then padded with
    # zeros — so padded-query rows contribute nothing anywhere
    d_row = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # [B, H, S]
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        g = jnp.pad(g, widths)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad)))
        d_row = jnp.pad(d_row, ((0, 0), (0, 0), (0, pad)))

    local = functools.partial(
        _ring_bwd_local, seq_len=s, axis_name=axis_name, scale=scale
    )
    spec = P(None, axis_name, None, None)
    lse_spec = P(None, None, axis_name)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, lse_spec, lse_spec),
        out_specs=(spec, spec, spec),
    )
    dq, dk, dv = jax.jit(fn)(q, k, v, g, lse, d_row)
    return dq[:, :s], dk[:, :s], dv[:, :s]


ring_attention_trainable.defvjp(_rat_fwd, _rat_bwd)


def _ring_local_fn(seq_len, axis_name, scale):
    """Expose the shard-local body for composition inside larger
    shard_map'ped programs (e.g. a fully sequence-parallel DiT block)."""
    return functools.partial(
        _ring_attention_local, seq_len=seq_len, axis_name=axis_name, scale=scale
    )
