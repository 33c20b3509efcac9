"""wav2vec2 embedding alternative (models/wav2vec2_embed.py) — exercised
with a tiny randomly-initialized model so no network/download is needed
(reference counterpart: notebooks/dataperf_wav2vec2.py:43-55)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def embedder():
    from transformers import Wav2Vec2Config, Wav2Vec2FeatureExtractor, Wav2Vec2Model

    from multilingual_kws_tpu.models.wav2vec2_embed import Wav2Vec2Embedder

    torch.manual_seed(0)
    config = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16, 16, 16, 16, 16, 16, 16),
        num_feat_extract_layers=7,
    )
    return Wav2Vec2Embedder(
        model=Wav2Vec2Model(config), extractor=Wav2Vec2FeatureExtractor()
    )


def test_embed_shapes_and_determinism(embedder):
    rng = np.random.default_rng(0)
    waves = [rng.normal(0, 0.1, 16000).astype(np.float32) for _ in range(3)]
    e1 = embedder.embed(waves)
    e2 = embedder.embed(waves)
    assert e1.shape == (3, 32) and e1.dtype == np.float32
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    # distinct inputs -> distinct embeddings
    assert not np.allclose(e1[0], e1[1])


def test_embed_files_roundtrip(embedder, tmp_path):
    from multilingual_kws_tpu.utils.wav import write_wav

    rng = np.random.default_rng(1)
    files = []
    for i in range(2):
        p = tmp_path / f"{i}.wav"
        write_wav(p, rng.normal(0, 0.1, 16000).astype(np.float32).clip(-1, 1))
        files.append(str(p))
    e = embedder.embed_files(files)
    assert e.shape == (2, 32)


def test_uniform_batch_matches_single(embedder):
    """KWS clips are uniform 1 s — batching them must not change the
    embedding at all (no padding involved)."""
    rng = np.random.default_rng(2)
    a = rng.normal(0, 0.1, 16000).astype(np.float32)
    b = rng.normal(0, 0.1, 16000).astype(np.float32)
    alone = embedder.embed([a])[0]
    batched = embedder.embed([a, b])[0]
    np.testing.assert_allclose(alone, batched, atol=1e-4)


def test_padding_mask_consistency(embedder):
    """Mixed-length batches: masked pooling + constructed attention mask
    keep a clip's embedding close to its solo embedding. (Exact equality is
    impossible: the base extractor's per-sequence normalization runs over
    the padded length — inherent to the wav2vec2-base contract — and a
    randomly-initialized model amplifies that; trained checkpoints sit much
    closer.) Without the masking, pooling averages garbage frames and the
    cosine collapses far below this bound."""
    rng = np.random.default_rng(2)
    short = rng.normal(0, 0.1, 8000).astype(np.float32)
    long_ = rng.normal(0, 0.1, 16000).astype(np.float32)
    alone = embedder.embed([short])[0]
    batched = embedder.embed([short, long_])[0]
    cos = np.dot(alone, batched) / (
        np.linalg.norm(alone) * np.linalg.norm(batched)
    )
    assert cos > 0.8, cos
