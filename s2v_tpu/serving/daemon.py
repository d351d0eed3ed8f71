"""Serving daemon: a persistent process that holds the loaded pipeline
(weights HBM-resident) and its compiled-denoise executable cache, and
serves generation requests over a unix-domain socket.

The reference has no serving story (one process per clip, paying model
load + compile every time — src/inference.py main()).  On TPU the
load+compile cost dominates short jobs, so production serving needs a
resident process: first request per geometry compiles once, every
subsequent request reuses the executable (S2VPipeline._compiled_denoise;
seeds are traced arguments so they never recompile).

Protocol: newline-delimited JSON request/response pairs.

  {"op": "ping"}
  {"op": "stats"}
  {"op": "warmup",   ...generate-kwargs}            # compile without export
  {"op": "generate", "prompt": ..., "ref_img_path": ...,
   "output_path": ..., ...generate-kwargs}
  # "prompt" may be a list of strings: one batched denoise, one mp4 per
  # prompt (output_path gets _0/_1/... suffixes), subject image shared
  {"op": "load_lora", "checkpoint_path": ..., "lora_alpha": 64,
   "lora_mode": "merge" | "runtime"}
  # hot-swap the subject adapter (null checkpoint_path = base weights);
  # compiled executables survive the swap (params are traced arguments),
  # so switching subjects costs a host reload, not a re-jit.  "runtime"
  # keeps the base kernels untouched and attaches low-rank factors applied
  # inside the block scan: swaps cost a ~0.4 GB factor upload (~0 s for
  # cached adapters) at <0.5% per-step FLOPs — the multi-tenant mode.
  # generate/warmup also accept "lora_checkpoint" (+"lora_alpha",
  # "lora_mode") inline: the daemon swaps automatically when it differs
  # from the active adapter
  {"op": "shutdown"}

Responses: {"status": "ok", ...} | {"status": "error", "error": msg}.
Requests are served FIFO on one worker — the TPU is single-tenant
(concurrent programs would contend for HBM); batching across prompts is
expressed *inside* a request via num_videos_per_prompt / prompt lists.
"""

from __future__ import annotations

import json
import os
import socket
import time
import traceback
from typing import Optional

import numpy as np

# generate() kwargs a request may override, with coercers
_GEN_KEYS = {
    "negative_prompt": str,
    "height": int,
    "width": int,
    "num_frames": int,
    "num_inference_steps": int,
    "guidance_scale": float,
    "use_dynamic_cfg": bool,
    "use_dpm": bool,
    "num_videos_per_prompt": int,
    "seed": int,
    "cfg_mode": str,
    "adaptive_threshold": float,
    "cfg_skip_threshold": float,
    "segment_steps": int,
}


class ServingDaemon:
    def __init__(self, pipe, socket_path: str, fps: int = 8,
                 lora_checkpoint: Optional[str] = None,
                 lora_mode: str = "merge", lora_alpha: float = 64.0):
        self.pipe = pipe
        self.socket_path = socket_path
        self.fps = fps
        self.requests_served = 0
        self.clips_generated = 0
        # the adapter merged at startup (serve --checkpoint_path), kept
        # current by op load_lora; surfaced in stats so orchestrators can
        # key subject-swap decisions on it
        self.lora_checkpoint = lora_checkpoint
        self.lora_alpha = float(lora_alpha)
        # default swap mode for requests that don't name one — NEVER
        # mutated by requests; lora_mode below tracks the ACTIVE adapter's
        # mode
        self.default_lora_mode = lora_mode
        self.lora_mode = lora_mode
        self._latencies: list = []  # generate seconds, compile excluded
        self._t_start = time.time()

    # -- request handlers ------------------------------------------------

    def _jit_entries(self) -> int:
        """Total compiled-executable count, counting retraces *inside* each
        cached jit (a new ref-latent shape at a cached geometry retraces
        without growing the dict)."""
        total = 0
        for f in self.pipe._compiled_denoise.values():
            try:
                total += f._cache_size()
            except Exception:
                total += 1
        return total

    def _gen_kwargs(self, req: dict) -> dict:
        kwargs = {}
        for k, coerce in _GEN_KEYS.items():
            if k in req and req[k] is not None:
                kwargs[k] = coerce(req[k])
        return kwargs

    def handle(self, req: dict) -> dict:
        op = req.get("op", "generate")
        if op == "ping":
            return {"status": "ok", "pong": True}
        if op == "stats":
            lat = sorted(self._latencies)
            pct = lambda p: round(lat[min(len(lat) - 1, int(p * len(lat)))], 2) if lat else None
            return {
                "status": "ok",
                "requests_served": self.requests_served,
                "clips_generated": self.clips_generated,
                "compiled_configs": len(self.pipe._compiled_denoise),
                "lora_checkpoint": self.lora_checkpoint,
                "lora_mode": self.lora_mode,
                "uptime_s": round(time.time() - self._t_start, 1),
                "generate_latency_s": {"p50": pct(0.5), "p90": pct(0.9), "max": pct(1.0)},
            }
        if op == "load_lora":
            path = req.get("checkpoint_path")
            if path is not None and not os.path.exists(path):
                return {"status": "error", "error": f"checkpoint not found: {path}"}
            mode = str(req.get("lora_mode") or self.default_lora_mode)
            # an omitted alpha means "keep the configured/active alpha" — a
            # daemon started with --lora_alpha 32 must not silently
            # re-merge at 64 when a request names only the checkpoint
            alpha = float(req.get("lora_alpha", self.lora_alpha))
            t0 = time.time()
            self.pipe.load_lora(path, lora_alpha=alpha, mode=mode)
            self.lora_checkpoint = path
            self.lora_alpha = alpha
            self.lora_mode = mode
            return {
                "status": "ok",
                "lora_checkpoint": path,  # None => base weights
                "lora_mode": mode,
                "seconds": round(time.time() - t0, 2),
                "compiled_configs_kept": len(self.pipe._compiled_denoise),
            }
        if op == "shutdown":
            return {"status": "ok", "shutdown": True}
        if op in ("generate", "warmup"):
            return self._generate(req, export=op == "generate")
        return {"status": "error", "error": f"unknown op {op!r}"}

    def _generate(self, req: dict, export: bool) -> dict:
        from s2v_tpu.utils.video import export_to_video

        swapped = False
        if "lora_checkpoint" in req:
            want = req["lora_checkpoint"]
            # an omitted lora_mode means "don't care": the active adapter is
            # reused whatever its mode, and a fresh swap uses the daemon
            # default.  A named mode forces that mode.
            req_mode = req.get("lora_mode")
            want_mode = str(req_mode or self.default_lora_mode)
            # an omitted alpha means "keep the configured/active alpha"
            want_alpha = float(req.get("lora_alpha", self.lora_alpha))
            if want is not None and not os.path.exists(want):
                return {"status": "error", "error": f"checkpoint not found: {want}"}
            if (
                want != self.lora_checkpoint
                or want_alpha != self.lora_alpha
                or (req_mode is not None and want_mode != self.lora_mode)
            ):
                self.pipe.load_lora(want, lora_alpha=want_alpha, mode=want_mode)
                self.lora_checkpoint = want
                self.lora_alpha = want_alpha
                self.lora_mode = want_mode
                swapped = True

        kwargs = self._gen_kwargs(req)
        prompt = req.get("prompt")
        ref = req.get("ref_img_path")
        if export and (prompt is None or ref is None):
            return {"status": "error", "error": "generate needs prompt and ref_img_path"}
        if ref is not None and not os.path.exists(ref):
            return {"status": "error", "error": f"ref image not found: {ref}"}
        if not export and ref is None:
            # warmup without an image: synthesize ref latents at the target
            # latent geometry (compiles the same executable)
            import jax.numpy as jnp

            sc = self.pipe.vae_cfg.spatial_compression_ratio
            h = int(kwargs.get("height", 480)) // sc
            w = int(kwargs.get("width", 720)) // sc
            kwargs["ref_latents"] = jnp.zeros(
                (1, 1, h, w, self.pipe.transformer_cfg.in_channels),
                self.pipe.transformer_cfg.dtype,
            )

        t0 = time.time()
        cached_before = self._jit_entries()
        video = self.pipe.generate(prompt=prompt or "warmup", ref_image=ref, **kwargs)
        seconds = time.time() - t0
        compiled = self._jit_entries() > cached_before
        if export and not compiled:
            self._latencies = self._latencies[-999:] + [seconds]

        resp = {
            "status": "ok",
            "seconds": round(seconds, 2),
            "compiled": compiled,  # False => executable cache hit
            "shape": list(np.asarray(video).shape),
        }
        if swapped:
            resp["lora_checkpoint"] = self.lora_checkpoint
        if export:
            out_path = req.get("output_path") or os.path.join(
                req.get("output_dir", "."), f"s2v_{int(time.time())}.mp4"
            )
            outputs = []
            for clip in np.asarray(video):
                path = out_path if len(video) == 1 else (
                    os.path.splitext(out_path)[0] + f"_{len(outputs)}.mp4"
                )
                outputs.append(export_to_video(clip, path, fps=int(req.get("fps", self.fps))))
            self.clips_generated += len(outputs)
            resp["outputs"] = outputs
        return resp

    # -- socket loop -----------------------------------------------------

    def serve_forever(self, ready_file: Optional[str] = None) -> None:
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(self.socket_path)
        srv.listen(8)
        if ready_file:
            with open(ready_file, "w") as f:
                f.write("ready")
        try:
            shutdown = False
            while not shutdown:
                conn, _ = srv.accept()
                # a dead/idle client must not wedge the single-worker loop:
                # reads between requests time out and we move to accept()
                conn.settimeout(30.0)
                try:
                    with conn, conn.makefile("rwb") as stream:
                        for line in stream:
                            line = line.strip()
                            if not line:
                                continue
                            try:
                                req = json.loads(line)
                                resp = self.handle(req)
                            except Exception as e:  # keep the daemon alive
                                resp = {
                                    "status": "error",
                                    "error": f"{type(e).__name__}: {e}",
                                    "traceback": traceback.format_exc(limit=8),
                                }
                            self.requests_served += 1
                            stream.write((json.dumps(resp) + "\n").encode())
                            stream.flush()
                            if resp.get("shutdown"):
                                shutdown = True
                                break
                except (TimeoutError, OSError):
                    pass  # dead/idle client: drop it, go back to accept()
        finally:
            srv.close()
            if os.path.exists(self.socket_path):
                os.unlink(self.socket_path)
