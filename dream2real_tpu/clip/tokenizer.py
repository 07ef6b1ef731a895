"""CLIP BPE tokenizer.

Wraps transformers' CLIPTokenizer when its vocab files are reachable locally
(same tokenization the reference's CLIPProcessor applies, clip_scoring.py:177);
otherwise falls back to a deterministic hash tokenizer so the scoring pipeline
stays runnable end-to-end in hermetic environments (scores are then only
self-consistent, not CLIP-semantic — callers can check `is_semantic`).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_SOT = 49406
_EOT = 49407


class ClipTokenizer:
    def __init__(self, path: str | None = None, context_length: int = 77, vocab_size: int = 49408):
        self.context_length = context_length
        self.vocab_size = vocab_size
        self.is_semantic = False
        self._tok = None
        path = path or os.environ.get("D2R_CLIP_PATH") or "openai/clip-vit-large-patch14-336"
        try:
            from transformers import CLIPTokenizerFast

            self._tok = CLIPTokenizerFast.from_pretrained(path, local_files_only=True)
            self.is_semantic = True
        except Exception:
            self._tok = None

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        """texts -> (B, context_length) int32 ids, padded, truncated, with
        SOT/EOT framing (matching CLIPProcessor padding='max_length'
        semantics for the towers we feed)."""
        if self._tok is not None:
            out = self._tok(
                list(texts),
                padding="max_length",
                truncation=True,
                max_length=self.context_length,
                return_tensors="np",
            )
            return out["input_ids"].astype(np.int32)
        return self._hash_tokenize(texts)

    def _hash_tokenize(self, texts: Sequence[str]) -> np.ndarray:
        """Deterministic fallback: one pseudo-token per whitespace word.

        EOT keeps the highest id so encode_text's argmax pooling still finds
        the sequence end.
        """
        import hashlib

        ids = np.zeros((len(texts), self.context_length), np.int32)
        for r, text in enumerate(texts):
            toks = [_SOT]
            for word in text.lower().strip().split():
                h = int(hashlib.md5(word.encode()).hexdigest(), 16)
                toks.append(1 + (h % (self.vocab_size - 3)))
                if len(toks) >= self.context_length - 1:
                    break
            toks.append(_EOT)
            ids[r, : len(toks)] = toks
        return ids
