"""SP attention kernel timing robust to a degraded relay.

The per-dispatch chain method (tools/bench_sp.py) breaks when the relay's
per-fetch fixed cost drifts by seconds between chains.  This variant puts
the repetition INSIDE one XLA program — ``lax.scan`` threads the kernel
output back in as the next V so iterations serialize and cannot be
CSE'd — so each measurement is a single large fused execution, which the
relay reproduces faithfully (memory: multi-second programs match across
sessions to three digits while sub-second probes vary 10x).  Per-call
time is the slope between two scan lengths, cancelling the one
fetch cost per execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from s2v_tpu.ops.pallas.flash_attention import flash_attention  # noqa: E402

B, S, H, D = 1, 19126, 48, 64
RING = 8
S_LOC = (S + RING - 1) // RING  # 2391
FLOPS_FULL = 4 * B * H * S * S * D


def _sync(x):
    float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def scan_kernel(q, k, v0, n):
    """v_{i+1} = attn(q, k, v_i): n serialized kernel executions."""

    def body(v, _):
        o = flash_attention(q, k, v)
        return o.astype(v.dtype), None

    v_final, _ = jax.lax.scan(body, v0, None, length=n)
    return v_final


def slope_time(q, k, v, n1, n2, reps=2, fn=scan_kernel):
    """Per-iteration time of ``fn(q, k, v, n)`` as the slope between two
    scan lengths (cancels the one per-execution fetch cost)."""
    f1 = jax.jit(functools.partial(fn, n=n1))
    f2 = jax.jit(functools.partial(fn, n=n2))
    _sync(f1(q, k, v))  # compile
    _sync(f2(q, k, v))

    def run(f):
        t0 = time.perf_counter()
        _sync(f(q, k, v))
        return time.perf_counter() - t0

    t1 = min(run(f1) for _ in range(reps))
    t2 = min(run(f2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1), t1, t2


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32).astype(dt)
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32).astype(dt)
    v = jax.random.normal(kv, (B, S, H, D), jnp.float32).astype(dt)

    small = flash_attention(q[:, :256, :2], k[:, :256, :2], v[:, :256, :2])
    jax.block_until_ready(small)

    t_full, a, b = slope_time(q, k, v, 25, 150)
    print(f"full SxS kernel:      {t_full * 1e3:8.2f} ms  "
          f"({FLOPS_FULL / t_full / 1e12:.1f} TF/s)  [chains {a:.1f}/{b:.1f} s]")

    # AG-KV: S/8 query rows x full K (v must match q rows for the scan
    # feedback, so scan over (q_loc, k, v_full->o_loc) — feed o into the
    # first S_LOC rows of v to keep the dependency)
    q_loc = q[:, :S_LOC]

    def scan_ag(q_, k_, v_, n):
        def body(v_full, _):
            o = flash_attention(q_, k_, v_full)
            v_next = jax.lax.dynamic_update_slice(
                v_full, o.astype(v_full.dtype), (0, 0, 0, 0))
            return v_next, None

        out, _ = jax.lax.scan(body, v_, None, length=n)
        return out

    t_ag, a, b = slope_time(q_loc, k, v, 50, 350, fn=scan_ag)
    print(f"AG-KV shard kernel:   {t_ag * 1e3:8.2f} ms  (ideal full/8 = "
          f"{t_full / 8 * 1e3:.2f}; ratio {t_ag / (t_full / 8):.2f}x)  "
          f"[chains {a:.1f}/{b:.1f} s]")

    # Ulysses: full SxS rows, H/8 heads
    h_loc = H // RING
    qh, kh, vh = q[:, :, :h_loc], k[:, :, :h_loc], v[:, :, :h_loc]

    t_uly, t1, t2 = slope_time(qh, kh, vh, 50, 350)
    print(f"Ulysses shard kernel: {t_uly * 1e3:8.2f} ms  ({h_loc} heads x full "
          f"SxS; ideal full/8 = {t_full / 8 * 1e3:.2f}; ratio "
          f"{t_uly / (t_full / 8):.2f}x)  [chains {t1:.1f}/{t2:.1f} s]")


if __name__ == "__main__":
    main()
