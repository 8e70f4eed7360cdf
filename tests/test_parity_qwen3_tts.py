"""Offline cross-framework parity: Qwen3-TTS code predictor vs transformers.

The reference Qwen3-TTS talker/code-predictor (tts/models/qwen3_tts/
talker.py:483-745) mirrors the Qwen3-Omni talker code predictor, which
transformers ships as ``Qwen3OmniMoeTalkerCodePredictorModelForConditional
Generation`` (dense Qwen3-style GQA layers with per-head q/k RMSNorm, one
codec embedding and one lm_head per residual code group). A tiny
random-init torch model's ``state_dict()`` is loaded straight into our
``Qwen3TTSTalkerCodePredictor`` (same key layout) and hidden states +
per-group logits must match — proving the shared TalkerDecoderLayer math
(attention/qk-norm/rope/MLP) and the code-predictor wiring.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.tts.models.qwen3_tts.config import (
    Qwen3TTSTalkerCodePredictorConfig,
)
from mlx_audio_tpu.tts.models.qwen3_tts.talker import Qwen3TTSTalkerCodePredictor

VOCAB = 64
HIDDEN = 48
INTER = 96
LAYERS = 2
HEADS = 4
KV_HEADS = 2
HEAD_DIM = 16
GROUPS = 4  # num_code_groups → 3 codec embeddings + 3 lm heads


def _tiny_pair():
    torch.manual_seed(11)
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerCodePredictorConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration,
    )

    hf_cfg = Qwen3OmniMoeTalkerCodePredictorConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        intermediate_size=INTER,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS,
        head_dim=HEAD_DIM,
        num_code_groups=GROUPS,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        attention_bias=False,
        layer_types=["full_attention"] * LAYERS,
    )
    hf = Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration(
        hf_cfg
    ).eval()

    cfg = Qwen3TTSTalkerCodePredictorConfig.from_dict(
        dict(
            vocab_size=VOCAB,
            hidden_size=HIDDEN,
            intermediate_size=INTER,
            num_hidden_layers=LAYERS,
            num_attention_heads=HEADS,
            num_key_value_heads=KV_HEADS,
            head_dim=HEAD_DIM,
            num_code_groups=GROUPS,
            rope_theta=10000.0,
            rms_norm_eps=1e-6,
            attention_bias=False,
        )
    )
    # talker_hidden == predictor hidden → no small_to_mtp_projection,
    # matching the torch module (which has none either).
    cp = Qwen3TTSTalkerCodePredictor(cfg, talker_hidden_size=HIDDEN)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cp = load_weights(cp, sd, strict=True).eval()
    return hf, cp


@pytest.fixture(scope="module")
def pair():
    return _tiny_pair()


def test_code_predictor_hidden_and_logits_parity(pair):
    hf, cp = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 7, HIDDEN)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_h = hf.model(
            inputs_embeds=torch.from_numpy(x), use_cache=False
        ).last_hidden_state
        ref_logits = [head(ref_h).numpy() for head in hf.lm_head]
        ref_h = ref_h.numpy()

    ours_h, _ = cp.model(jnp.asarray(x), mask="causal")
    np.testing.assert_allclose(np.asarray(ours_h), ref_h, atol=2e-5, rtol=2e-5)
    for i, head in enumerate(cp.lm_head):
        np.testing.assert_allclose(
            np.asarray(head(ours_h)), ref_logits[i], atol=2e-5, rtol=2e-5
        )


def test_codec_embedding_parity(pair):
    hf, cp = pair
    codes = np.arange(GROUPS - 1)[None] * 7 % VOCAB  # (1, GROUPS-1)
    with torch.no_grad():
        ref = np.stack(
            [
                hf.model.codec_embedding[i](torch.from_numpy(codes[:, i]))
                .numpy()
                for i in range(GROUPS - 1)
            ]
        )
    ours = np.stack(
        [
            np.asarray(cp.model.codec_embedding[i](jnp.asarray(codes[:, i])))
            for i in range(GROUPS - 1)
        ]
    )
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)


def test_code_predictor_cached_step_matches_full(pair):
    """Incremental decode through our KVCache == one full causal forward
    (the generation loop in qwen3_tts.py:136-181 relies on this)."""
    _, cp = pair
    rng = np.random.default_rng(1)
    T = 5
    x = rng.standard_normal((1, T, HIDDEN)).astype(np.float32) * 0.3

    full_h, _ = cp.model(jnp.asarray(x), mask="causal")

    caches = cp.model.make_caches(batch=1, max_len=T)
    steps = []
    for t in range(T):
        h, caches = cp.model(jnp.asarray(x[:, t : t + 1]), caches=caches)
        steps.append(np.asarray(h)[:, 0])
    inc_h = np.stack(steps, axis=1)
    np.testing.assert_allclose(inc_h, np.asarray(full_h), atol=1e-5, rtol=1e-5)
