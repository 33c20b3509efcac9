"""wav2vec2 embedding alternative (optional, CPU torch).

Equivalent of reference notebooks/dataperf_wav2vec2.py:43-55: mean-pooled
wav2vec2 hidden states as an alternative embedding extractor for the
dataperf selection harness (analysis/dataperf.py). Requires the
transformers+torch stack (baked into this environment) and a local/remote
model checkpoint; everything is lazily imported and cleanly gated so the
core framework never depends on torch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class Wav2Vec2Embedder:
    """Mean-pooled last-hidden-state embeddings of 16 kHz waveforms."""

    def __init__(self, model_name: str = "facebook/wav2vec2-base",
                 device: str = "cpu"):
        try:
            import torch
            from transformers import Wav2Vec2Model, Wav2Vec2FeatureExtractor
        except Exception as e:  # pragma: no cover - env without torch
            raise ImportError(
                "wav2vec2 embeddings need torch+transformers"
            ) from e
        self._torch = torch
        self.extractor = Wav2Vec2FeatureExtractor.from_pretrained(model_name)
        self.model = Wav2Vec2Model.from_pretrained(model_name).to(device).eval()
        self.device = device

    def embed(self, waveforms: Sequence[np.ndarray],
              sample_rate: int = 16000) -> np.ndarray:
        """list of (N,) float waveforms -> (B, hidden) float32 embeddings."""
        torch = self._torch
        inputs = self.extractor(
            [np.asarray(w, np.float32) for w in waveforms],
            sampling_rate=sample_rate,
            return_tensors="pt",
            padding=True,
        )
        with torch.no_grad():
            out = self.model(
                inputs.input_values.to(self.device),
                attention_mask=getattr(inputs, "attention_mask", None),
            )
        hidden = out.last_hidden_state  # (B, T, H)
        return hidden.mean(dim=1).cpu().numpy().astype(np.float32)

    def embed_files(self, files: Sequence[str]) -> np.ndarray:
        from ..utils.wav import read_wav

        return self.embed([read_wav(f)[0] for f in files])
