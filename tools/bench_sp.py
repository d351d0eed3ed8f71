"""Measure the SP attention building blocks on the real chip (v5e).

Produces the component numbers for docs/SCALING.md: per-device kernel time
for the all-gather-KV strategy (query shard x full K extent), per-hop kernel
time for ring (query shard x shard-width K block), and the ring merge
overhead (the fp32 rescale of the accumulator between hops).  ICI transfer
terms are computed from v5e link specs (one chip here — nothing to measure).

Timing per the repo methodology: chain n async dispatches, fetch ONE scalar
at the end (a per-call fetch through the relay costs ~27 ms and corrupts
numbers).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2v_tpu.ops.pallas.flash_attention import flash_attention  # noqa: E402

B, S, H, D = 1, 19126, 48, 64
RING = int(os.environ.get("S2V_BENCH_SP_RING", "8"))  # tools/pod_day.py sets 16
S_LOC = (S + RING - 1) // RING  # 2391
FLOPS_FULL = 4 * B * H * S * S * D  # qk + pv


def _sync(out):
    # block_until_ready is NOT a reliable sync through the axon relay; a
    # scalar fetch is (see memory/tpu-timing-methodology)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def timeit(fn, *args, n1=4, n2=12, reps=3):
    """Two-point chain fit: the relay adds a LARGE, *variable* fixed cost
    per host fetch (4-14 s observed), so a single averaged chain is
    fixed-cost-dominated for sub-second ops.  Time chains of n1 and n2
    dispatches (one fetch each), repeat, and take the slope between the
    per-length minima — the fixed cost cancels, the min damps drift."""
    _sync(fn(*args))  # compile + warm
    _sync(fn(*args))

    def chain(n):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _sync(outs[-1])
        return time.perf_counter() - t0

    t1 = min(chain(n1) for _ in range(reps))
    t2 = min(chain(n2) for _ in range(reps))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32).astype(dt)
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32).astype(dt)
    v = jax.random.normal(kv, (B, S, H, D), jnp.float32).astype(dt)
    q_loc = q[:, :S_LOC]
    k_loc = k[:, :S_LOC]
    v_loc = v[:, :S_LOC]

    # warm the Mosaic cache with a small kernel
    small = flash_attention(q[:, :256, :2], k[:, :256, :2], v[:, :256, :2])
    jax.block_until_ready(small)

    # 1. single-chip full attention (the baseline this must beat /ring)
    t_full = timeit(jax.jit(lambda a, b_, c: flash_attention(a, b_, c)), q, k, v)
    print(f"full S x S kernel:        {t_full * 1e3:8.2f} ms  "
          f"({FLOPS_FULL / t_full / 1e12:.1f} TF/s)")

    # 2. all-gather-KV per-device compute: query shard x full K
    t_ag = timeit(jax.jit(lambda a, b_, c: flash_attention(a, b_, c)), q_loc, k, v)
    print(f"AG-KV shard kernel:       {t_ag * 1e3:8.2f} ms  (ideal = full/{RING} "
          f"= {t_full / RING * 1e3:.2f} ms)")

    # 2b. Ulysses per-device compute: FULL S x S extent, H/ring heads
    # (all-to-all head scatter; validates that shrinking the head axis —
    # a parallel grid dimension — keeps kernel efficiency)
    h_loc = H // RING
    t_uly = timeit(
        jax.jit(lambda a, b_, c: flash_attention(a, b_, c)),
        q[:, :, :h_loc], k[:, :, :h_loc], v[:, :, :h_loc],
    )
    print(f"Ulysses shard kernel:     {t_uly * 1e3:8.2f} ms  ({h_loc} heads x full "
          f"SxS; ideal = full/{RING} = {t_full / RING * 1e3:.2f} ms)")

    # 3. ring per-hop kernel: query shard x one K shard (ragged k extent)
    mask = jnp.zeros((S_LOC,), bool)
    t_hop = timeit(
        jax.jit(lambda a, b_, c: flash_attention(a, b_, c, key_pad_mask=mask)),
        q_loc, k_loc, v_loc,
    )
    print(f"ring per-hop kernel:      {t_hop * 1e3:8.2f} ms  (x{RING} = "
          f"{t_hop * RING * 1e3:.2f} ms)")

    # 4. ring hop + lse merge (simulated single-device loop, no ppermute)
    def ring_sim(q_, k_, v_):
        o_acc = jnp.zeros((B, S_LOC, H, D), jnp.float32)
        lse_acc = jnp.full((B, H, S_LOC), -1e30, jnp.float32)
        for _ in range(RING):
            o_i, lse_i = flash_attention(
                q_, k_, v_, return_lse=True, key_pad_mask=mask
            )
            lse_new = jnp.logaddexp(lse_acc, lse_i)
            w_acc = jnp.exp(lse_acc - lse_new).transpose(0, 2, 1)[..., None]
            w_i = jnp.exp(lse_i - lse_new).transpose(0, 2, 1)[..., None]
            o_acc = o_acc * w_acc + o_i.astype(jnp.float32) * w_i
            lse_acc = lse_new
        return o_acc

    t_ring = timeit(jax.jit(ring_sim), q_loc, k_loc, v_loc)
    print(f"ring {RING}-hop loop (sim):    {t_ring * 1e3:8.2f} ms  (merge overhead "
          f"{(t_ring - RING * t_hop) * 1e3:.2f} ms)")

    # ICI model terms (v5e: 4 links/chip, ~45 GB/s each way per link; a ring
    # all-gather moves (ring-1)/ring of the KV bytes through each device)
    kv_bytes = 2 * S * H * D * 2  # K+V bf16
    ici_bw = 90e9  # ~2 links active each way on a 2D-torus ring path
    t_ici_ag = kv_bytes * (RING - 1) / RING / ici_bw
    t_ici_hop = kv_bytes / RING / ici_bw
    print(f"KV bytes/layer: {kv_bytes / 1e6:.1f} MB; "
          f"AG ICI ~{t_ici_ag * 1e3:.2f} ms/layer; "
          f"ring ICI ~{t_ici_hop * 1e3:.2f} ms/hop "
          f"(x{RING} = {t_ici_hop * RING * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
