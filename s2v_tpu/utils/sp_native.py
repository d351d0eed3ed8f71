"""ctypes binding for the native C++ sentencepiece unigram tokenizer
(native/sp_tokenizer.cc) — the framework's equivalent of the reference's
sentencepiece C++ dependency (SURVEY.md §2.4).

Builds the shared library on first use if g++ is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Union

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsp_tokenizer.so")


def _build_lib() -> str:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _load_lib() -> ctypes.CDLL:
    # always invoke make: rebuilds on source staleness, ~ms no-op otherwise
    try:
        _build_lib()
    except Exception:
        if not os.path.exists(_LIB_PATH):
            raise
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sp_load.restype = ctypes.c_void_p
    lib.sp_load.argtypes = [ctypes.c_char_p]
    lib.sp_vocab_size.restype = ctypes.c_int
    lib.sp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.sp_piece_to_id.restype = ctypes.c_int
    lib.sp_piece_to_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.sp_encode.restype = ctypes.c_int
    lib.sp_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.sp_free.argtypes = [ctypes.c_void_p]
    return lib


def _needs_nmt_nfkc(text: str) -> bool:
    """True when the native no-normalization path could diverge from the
    reference's sentencepiece ``nmt_nfkc`` normalizer: any non-ASCII
    character, or ASCII that NFKC would still rewrite.  ASCII printable text
    is nmt_nfkc-invariant (the charsmap only rewrites control/space/compat
    codepoints), which is the regime the native Viterbi path is
    parity-tested in."""
    import unicodedata

    if any(ord(c) > 0x7F for c in text):
        return True
    return unicodedata.normalize("NFKC", text) != text


class NativeSPTokenizer:
    """T5-style tokenizer over a raw ``spiece.model``: unigram Viterbi in
    C++, ``<cls>``-aware, pads to max_length and appends EOS (matching the
    reference pipeline's ``padding="max_length"`` call,
    pipeline_cogvideox.py:209-218).

    Scope guard: the C++ path applies **no** nmt_nfkc normalization, so a
    non-ASCII prompt (accented/CJK/full-width text) could silently tokenize
    differently from the reference's sentencepiece.  Such prompts are
    rerouted to the ``tokenizers`` wrapper when a ``tokenizer.json`` is
    available (``fallback_tokenizer_json``, auto-discovered next to the
    spiece.model), and rejected with a clear error otherwise."""

    def __init__(
        self,
        spiece_model_path: str,
        cls_token: str = "<cls>",
        fallback_tokenizer_json: str = None,
    ):
        self._lib = _load_lib()
        self._h = self._lib.sp_load(spiece_model_path.encode())
        if not self._h:
            raise ValueError(f"failed to parse sentencepiece model: {spiece_model_path}")
        self.pad_id = 0
        self.eos_id = 1
        self.unk_id = 2
        # <cls> registered as an additional special token: first id past the
        # sp vocab (reference src/inference.py:182-189 -> id 32100 for T5).
        self.cls_token = cls_token
        self.cls_id = self._lib.sp_vocab_size(self._h)
        if fallback_tokenizer_json is None:
            candidate = os.path.join(
                os.path.dirname(os.path.abspath(spiece_model_path)), "tokenizer.json"
            )
            fallback_tokenizer_json = candidate if os.path.exists(candidate) else None
        self._fallback_json = fallback_tokenizer_json
        self._fallback = None  # built lazily on the first non-ASCII prompt

    def _fallback_tokenizer(self):
        if self._fallback is None and self._fallback_json:
            from s2v_tpu.utils.tokenizer import T5CLSTokenizer

            self._fallback = T5CLSTokenizer(self._fallback_json, self.cls_token)
        return self._fallback

    def __len__(self) -> int:
        return self._lib.sp_vocab_size(self._h) + 1  # + <cls>

    def piece_to_id(self, piece: str) -> int:
        if piece == self.cls_token:
            return self.cls_id
        return self._lib.sp_piece_to_id(self._h, piece.encode())

    def _encode_one(self, text: str, max_ids: int = 8192) -> List[int]:
        # split out <cls> occurrences (special tokens bypass the sp model)
        ids: List[int] = []
        parts = text.split(self.cls_token)
        buf = (ctypes.c_int * max_ids)()
        for i, part in enumerate(parts):
            if i > 0:
                ids.append(self.cls_id)
            part = part.strip()
            if part:
                n = self._lib.sp_encode(self._h, part.encode(), buf, max_ids)
                ids.extend(buf[:n])
        return ids

    def encode(self, prompts: Union[str, Sequence[str]], max_length: int = 226) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        if any(_needs_nmt_nfkc(p) for p in prompts):
            fb = self._fallback_tokenizer()
            if fb is not None:
                from s2v_tpu.utils.logging import get_logger

                get_logger("s2v_tpu.tokenizer").info(
                    "non-ASCII prompt: routing to the tokenizers backend "
                    "(the native sentencepiece path skips nmt_nfkc "
                    "normalization)"
                )
                return fb.encode(prompts, max_length)
            raise ValueError(
                "NativeSPTokenizer got a non-ASCII (or NFKC-non-invariant) "
                "prompt but the native path applies no nmt_nfkc "
                "normalization, so token ids could silently differ from the "
                "reference's sentencepiece.  Provide a tokenizer.json next "
                "to the spiece.model (rerouted automatically) or tokenize "
                "with s2v_tpu.utils.tokenizer.T5CLSTokenizer."
            )
        out = np.full((len(prompts), max_length), self.pad_id, np.int32)
        for i, p in enumerate(prompts):
            ids = self._encode_one(p)
            if len(ids) > max_length - 1:
                # reference truncation warning (pipeline_cogvideox.py:219-227);
                # the native lib has no detokenizer, so report the span size
                from s2v_tpu.utils.logging import get_logger

                get_logger("s2v_tpu.tokenizer").warning(
                    "Input truncated because `max_sequence_length` is set to "
                    "%d tokens: %d trailing tokens removed",
                    max_length, len(ids) - (max_length - 1),
                )
            ids = ids[: max_length - 1] + [self.eos_id]
            out[i, : len(ids)] = np.asarray(ids, np.int32)
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sp_free(self._h)
            self._h = None
