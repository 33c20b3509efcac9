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
    """Mean-pooled last-hidden-state embeddings of 16 kHz waveforms.

    model_name may be a hub id OR a local checkpoint directory (offline
    environments: download once elsewhere, pass the path). Pre-built
    model/extractor objects can be injected directly (tests use a tiny
    randomly-initialized Wav2Vec2Model, no network needed).
    """

    def __init__(self, model_name: str = "facebook/wav2vec2-base",
                 device: str = "cpu", model=None, extractor=None):
        try:
            import torch
            from transformers import Wav2Vec2Model, Wav2Vec2FeatureExtractor
        except Exception as e:  # pragma: no cover - env without torch
            raise ImportError(
                "wav2vec2 embeddings need torch+transformers"
            ) from e
        self._torch = torch
        self.extractor = (
            extractor
            if extractor is not None
            else Wav2Vec2FeatureExtractor.from_pretrained(model_name)
        )
        self.model = (
            model
            if model is not None
            else Wav2Vec2Model.from_pretrained(model_name)
        ).to(device).eval()
        self.device = device

    def embed(self, waveforms: Sequence[np.ndarray],
              sample_rate: int = 16000) -> np.ndarray:
        """list of (N,) float waveforms -> (B, hidden) float32 embeddings.

        Mean pooling covers only each clip's REAL frames: batch padding is
        excluded via the conv feature-extractor's length arithmetic (the
        base checkpoint's extractor returns no attention mask, so pooling
        over padded frames would silently skew shorter clips)."""
        torch = self._torch
        waveforms = [np.asarray(w, np.float32) for w in waveforms]
        inputs = self.extractor(
            waveforms, sampling_rate=sample_rate,
            return_tensors="pt", padding=True,
        )
        # Only forward a mask the extractor itself produced: group-norm base
        # checkpoints (return_attention_mask=False, e.g. wav2vec2-base) were
        # trained without padding masks and HF recommends not passing one —
        # a synthesized mask would shift batched embeddings vs single-clip
        # inference. Padded frames are still excluded from mean pooling
        # below via the conv length arithmetic.
        mask = getattr(inputs, "attention_mask", None)
        with torch.no_grad():
            out = self.model(
                inputs.input_values.to(self.device),
                attention_mask=mask.to(self.device) if mask is not None else None,
            )
        hidden = out.last_hidden_state  # (B, T, H)
        in_lengths = torch.tensor([len(w) for w in waveforms])
        lengths = self.model._get_feat_extract_output_lengths(in_lengths).to(
            torch.long
        )
        idx = torch.arange(hidden.shape[1], device=hidden.device)[None, :]
        m = (idx < lengths.to(hidden.device)[:, None]).unsqueeze(-1)
        pooled = (hidden * m).sum(dim=1) / m.sum(dim=1).clamp(min=1)
        return pooled.cpu().numpy().astype(np.float32)

    def embed_files(self, files: Sequence[str]) -> np.ndarray:
        from ..utils.wav import read_wav

        return self.embed([read_wav(f)[0] for f in files])
