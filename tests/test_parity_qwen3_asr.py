"""Offline cross-framework parity: Qwen3-ASR audio tower vs transformers.

The Qwen3-ASR checkpoint layout is the Qwen3-Omni "thinker" (reference
stt/models/qwen3_asr/qwen3_asr.py:758-781 strips the ``thinker.`` prefix);
transformers ships the same audio tower as ``Qwen3OmniMoeAudioEncoder``.
Tiny random-init torch encoder → ``state_dict()`` (prefixed
``thinker.audio_tower.``) → ``Model.sanitize`` → ``load_weights`` — our
windowed conv/block-attention encoder must reproduce HF
``last_hidden_state`` on ragged lengths (behavioral spec: reference
qwen3_asr.py:263-440).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.stt.models.qwen3_asr.qwen3_asr import Model, ModelConfig

N_MELS = 32
D_MODEL = 64
DS_HIDDEN = 16
OUT_DIM = 48
N_WINDOW = 4          # mel chunk = 8 frames
N_WINDOW_INFER = 16   # block window = 2 conv chunks


def _tiny_pair():
    torch.manual_seed(7)
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
    )

    hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=N_MELS,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=128,
        d_model=D_MODEL,
        max_source_positions=64,
        n_window=N_WINDOW,
        output_dim=OUT_DIM,
        n_window_infer=N_WINDOW_INFER,
        downsample_hidden_size=DS_HIDDEN,
    )
    hf = Qwen3OmniMoeAudioEncoder(hf_cfg).eval()

    cfg = ModelConfig.from_dict(
        dict(
            audio_config=dict(
                num_mel_bins=N_MELS,
                encoder_layers=2,
                encoder_attention_heads=4,
                encoder_ffn_dim=128,
                d_model=D_MODEL,
                max_source_positions=64,
                n_window=N_WINDOW,
                output_dim=OUT_DIM,
                n_window_infer=N_WINDOW_INFER,
                downsample_hidden_size=DS_HIDDEN,
            ),
            text_config=dict(
                model_type="qwen3",
                vocab_size=64,
                hidden_size=32,
                intermediate_size=64,
                num_hidden_layers=1,
                num_attention_heads=2,
                num_key_value_heads=1,
                head_dim=16,
            ),
        )
    )
    model = Model(cfg)
    sd = {
        f"thinker.audio_tower.{k}": v.detach().numpy()
        for k, v in hf.state_dict().items()
    }
    clean = model.sanitize(sd)
    at = {
        k[len("audio_tower."):]: v
        for k, v in clean.items()
        if k.startswith("audio_tower.")
    }
    enc = load_weights(model.audio_tower, at, strict=True).eval()
    return hf, enc


@pytest.fixture(scope="module")
def qwen3_asr_pair():
    return _tiny_pair()


def _run_pair(hf, enc, n_frames, seed):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((N_MELS, n_frames)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(mel),
            feature_lens=torch.tensor([n_frames]),
        ).last_hidden_state.numpy()
    ours = np.asarray(enc(mel[None], feature_len=n_frames))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_audio_tower_parity_full_chunks(qwen3_asr_pair):
    hf, enc = qwen3_asr_pair
    _run_pair(hf, enc, n_frames=2 * N_WINDOW * 4, seed=0)  # 4 full chunks


def test_audio_tower_parity_ragged_tail(qwen3_asr_pair):
    """Last chunk shorter than n_window*2 exercises the ragged path
    (reference qwen3_asr.py:320-360)."""
    hf, enc = qwen3_asr_pair
    _run_pair(hf, enc, n_frames=27, seed=1)


def test_audio_tower_parity_single_short_chunk(qwen3_asr_pair):
    hf, enc = qwen3_asr_pair
    _run_pair(hf, enc, n_frames=5, seed=2)
