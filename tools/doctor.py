"""Environment doctor: validate the pieces a fresh deployment needs.

    python tools/doctor.py [--model_dir /path/or/repo-id]

Checks (each prints OK / WARN / FAIL with an actionable message):
  1. JAX backend comes up (bounded — a wedged TPU relay fails loudly
     instead of hanging, same watchdog as bench.py), device inventory.
  2. Native C++ libs (sentencepiece tokenizer, mp4 muxer) are built or
     buildable; fallbacks available (tokenizers / OpenCV).
  3. Compilation-cache dir writable.
  4. Optional: model snapshot layout (loaders.resolve validator).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OK, _WARN, _FAIL = "OK  ", "WARN", "FAIL"


def _report(level, what, detail=""):
    print(f"[{level}] {what}" + (f" — {detail}" if detail else ""))
    return level != _FAIL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default=None,
                    help="snapshot dir or hub repo id to layout-check")
    ap.add_argument("--init_timeout", type=int, default=120,
                    help="seconds to wait for the JAX backend")
    args = ap.parse_args()
    ok = True

    # 1. backend
    os.environ.setdefault("S2V_BENCH_INIT_TIMEOUT", str(args.init_timeout))
    import threading

    result = {}

    def _init():
        try:
            import jax

            result["devices"] = jax.devices()
        except BaseException as e:
            result["error"] = e

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    th.join(args.init_timeout)
    if "devices" in result:
        devs = result["devices"]
        _report(_OK, f"jax backend: {devs[0].platform} x {len(devs)}")
        if devs[0].platform == "cpu":
            _report(_WARN, "CPU backend only",
                    "fine for tests; TPU needed for production latency")
    elif "error" in result:
        ok = _report(_FAIL, "jax backend init failed", repr(result["error"]))
    else:
        ok = _report(_FAIL, f"jax backend init hung > {args.init_timeout}s",
                     "device relay unresponsive — retry later or check the "
                     "TPU runtime; CPU runs still work with JAX_PLATFORMS=cpu")

    # 2. native libs
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

    # 3. compilation cache
    try:
        cache = os.path.expanduser(os.environ.get(
            "S2V_TPU_CACHE_DIR", os.path.join("~", ".cache", "s2v_tpu", "xla")
        ))
        os.makedirs(cache, exist_ok=True)
        probe = os.path.join(cache, ".doctor_probe")
        open(probe, "w").close()
        os.remove(probe)
        _report(_OK, f"compilation cache writable: {cache}")
    except Exception as e:
        _report(_WARN, "compilation cache not writable", str(e))

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
