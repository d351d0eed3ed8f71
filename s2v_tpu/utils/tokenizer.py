"""T5 tokenization with ``<cls>`` special-token semantics.

The reference tokenizes with the HF T5 tokenizer, registers ``<cls>`` as an
additional special token (id 32100, inside the checkpoint's padded 32128-row
embedding) and pads/truncates to 226 tokens (src/inference.py:179-189,
pipeline_cogvideox.py:209-218).

Backend: the Rust ``tokenizers`` wheel loading ``tokenizer.json`` from the
checkpoint dir.  sentencepiece-only checkpoints (spiece.model without
tokenizer.json) are handled by the native C++ unigram tokenizer
(``s2v_tpu.utils.sp_native``), which the pipeline falls back to
automatically (pipelines/s2v.py).

Truncation parity note: the reference tokenizes through ``AutoTokenizer``,
which loads the *fast* (Rust) T5 tokenizer.  Under
``truncation=True, add_special_tokens=True`` the fast pipeline truncates to
``max_length - 1`` *reserving a slot for EOS*, then the TemplateProcessing
post-processor appends ``</s>`` — so even over-length prompts end in EOS
(verified empirically against ``PreTrainedTokenizerFast`` with the T5
``"$A </s>"`` template; the slow sentencepiece tokenizer would instead drop
the EOS, but the reference never instantiates it).  ``encode`` below
reproduces the fast semantics and emits the reference's truncation warning
(pipeline_cogvideox.py:219-227).
"""

from __future__ import annotations

import os
from typing import Sequence, Union

import numpy as np


class T5CLSTokenizer:
    """Pads to max_length with pad id, appends EOS, knows ``<cls>``."""

    def __init__(self, tokenizer_json_path: str, cls_token: str = "<cls>"):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(tokenizer_json_path)
        # register <cls> as a special token (reference add_special_tokens)
        if self._tok.token_to_id(cls_token) is None:
            from tokenizers import AddedToken

            self._tok.add_special_tokens([AddedToken(cls_token, special=True)])
        self.cls_token = cls_token
        self.cls_id = self._tok.token_to_id(cls_token)
        self.eos_id = self._tok.token_to_id("</s>")
        self.pad_id = self._tok.token_to_id("<pad>")

    def __len__(self) -> int:
        return self._tok.get_vocab_size(with_added_tokens=True)

    @classmethod
    def from_checkpoint_dir(cls, model_dir: str, subfolder: str = "tokenizer"):
        path = os.path.join(model_dir, subfolder, "tokenizer.json")
        if not os.path.exists(path):
            path = os.path.join(model_dir, "tokenizer.json")
        return cls(path)

    def encode(
        self, prompts: Union[str, Sequence[str]], max_length: int = 226
    ) -> np.ndarray:
        """``padding="max_length", truncation=True, add_special_tokens=True``
        (EOS appended, truncation keeps room for EOS) -> [B, max_length] int32."""
        if isinstance(prompts, str):
            prompts = [prompts]
        out = np.full((len(prompts), max_length), self.pad_id, np.int32)
        for i, p in enumerate(prompts):
            ids = self._tok.encode(p, add_special_tokens=False).ids
            if len(ids) > max_length - 1:
                # reference truncation warning (pipeline_cogvideox.py:219-227)
                removed = self._tok.decode(ids[max_length - 1 :])
                from s2v_tpu.utils.logging import get_logger

                get_logger("s2v_tpu.tokenizer").warning(
                    "The following part of your input was truncated because "
                    "`max_sequence_length` is set to %d tokens: %s",
                    max_length, removed,
                )
            ids = ids[: max_length - 1] + [self.eos_id]
            out[i, : len(ids)] = np.asarray(ids, np.int32)
        return out
