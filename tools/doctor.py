"""Environment doctor: validate the pieces a fresh deployment needs.

    python tools/doctor.py [--model_dir /path/or/repo-id]

Checks (each prints OK / WARN / FAIL with an actionable message):
  1. JAX backend comes up (bounded — a wedged device relay fails loudly
     instead of hanging; shared probe with bench.py / ensure_backend),
     device inventory.
  2. Native C++ libs (sentencepiece tokenizer, mp4 muxer) are built or
     buildable; fallbacks available (tokenizers / OpenCV).
  3. Compilation-cache resolution (the same logic the entry points use).
  4. Optional: model snapshot layout (loaders.resolve validator).

If the backend probe hangs, checks that import jax-importing modules are
SKIPPED: the probe thread may be wedged inside ``import jax`` holding the
module import lock, and touching it again from the main thread would hang
the doctor itself.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OK, _WARN, _FAIL, _SKIP = "OK  ", "WARN", "FAIL", "SKIP"


def _report(level, what, detail=""):
    print(f"[{level}] {what}" + (f" — {detail}" if detail else ""))
    return level != _FAIL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default=None,
                    help="snapshot dir or hub repo id to layout-check")
    ap.add_argument("--init_timeout", type=int, default=120,
                    help="seconds to wait for the JAX backend (> 0)")
    args = ap.parse_args()
    if args.init_timeout <= 0:
        ap.error("--init_timeout must be > 0")
    ok = True

    # 1. backend (bounded probe shared with bench.py / ensure_backend)
    from s2v_tpu.cli_utils import probe_backend

    result = probe_backend(args.init_timeout)
    hung = False
    if "devices" in result:
        devs = result["devices"]
        _report(_OK, f"jax backend: {devs[0].platform} x {len(devs)}")
        if devs[0].platform == "cpu":
            _report(_WARN, "CPU backend only",
                    "fine for tests; TPU needed for production latency")
    elif "error" in result:
        ok = _report(_FAIL, "jax backend init failed", repr(result["error"]))
    else:
        hung = True
        ok = _report(_FAIL, f"jax backend init hung > {args.init_timeout}s",
                     "device relay unresponsive — retry later or check the "
                     "TPU runtime; CPU runs still work with JAX_PLATFORMS=cpu")

    # 2. native libs (no jax involved)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for lib, fallback in [("libsp_tokenizer.so", "tokenizers (HF) wrapper"),
                          ("libmp4_muxer.so", "OpenCV VideoWriter")]:
        path = os.path.join(here, "native", lib)
        if os.path.exists(path):
            _report(_OK, f"native/{lib}")
        else:
            _report(_WARN, f"native/{lib} missing",
                    f"run `make -C native`; falls back to {fallback}")
    try:
        import cv2  # noqa: F401

        _report(_OK, "OpenCV available")
    except ImportError:
        _report(_WARN, "OpenCV missing", "video decode fallbacks unavailable")

    # 3 + 4 need modules that import jax — unsafe while the probe thread
    # may hold the import lock mid-`import jax`
    if hung:
        _report(_SKIP, "compilation cache / snapshot layout",
                "skipped: jax import may be wedged on the probe thread")
        sys.exit(1)

    # 3. compilation cache — the entry points' own resolution logic
    from s2v_tpu.cli_utils import enable_compilation_cache

    cache = enable_compilation_cache("auto")
    if cache is None:
        _report(_WARN, "compilation cache disabled",
                "S2V_TPU_CACHE_DIR=off (or unwritable dir); cold starts "
                "recompile the flagship jit every process start")
    else:
        _report(_OK, f"compilation cache writable: {cache}")

    # 4. snapshot layout
    if args.model_dir:
        from s2v_tpu.loaders.resolve import resolve_model_dir, validate_snapshot_layout

        try:
            d = resolve_model_dir(args.model_dir)
            validate_snapshot_layout(d)
            _report(_OK, f"snapshot layout: {d}")
        except Exception as e:
            ok = _report(_FAIL, "snapshot layout", str(e))

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
