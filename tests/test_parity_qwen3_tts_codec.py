"""Offline parity: Qwen3-TTS speech-tokenizer decoder transformer vs
transformers' Code2Wav transformer.

The reference speech tokenizer's sliding-window decoder transformer
(tts/models/qwen3_tts/speech_tokenizer.py:270-430) is the same
architecture transformers ships as ``Qwen3OmniMoeCode2WavTransformerModel``
(Qwen3-style GQA attention WITHOUT qk-norm, layer-scale residuals,
sliding-window causal mask). A tiny random-init torch stack is loaded
into our ``DecoderTransformer`` (identical key layout: layers.N.*,
self_attn_layer_scale.scale, norm.weight) and hidden states must match —
covering attention/rope/layer-scale math and the q-k<window mask
semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.tts.models.qwen3_tts.config import (
    Qwen3TTSTokenizerDecoderConfig,
)
from mlx_audio_tpu.tts.models.qwen3_tts.speech_tokenizer import (
    DecoderTransformer,
)

HIDDEN = 32
INTER = 64
LAYERS = 2
HEADS = 4
KV_HEADS = 2
HEAD_DIM = 8
WINDOW = 4


def _tiny_pair():
    torch.manual_seed(3)
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavTransformerModel,
    )

    hf_cfg = Qwen3OmniMoeCode2WavConfig(
        hidden_size=HIDDEN,
        intermediate_size=INTER,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS,
        head_dim=HEAD_DIM,
        sliding_window=WINDOW,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        layer_scale_initial_scale=0.01,
    )
    hf = Qwen3OmniMoeCode2WavTransformerModel(hf_cfg).eval()
    # randomize layer scales away from the 0.01 constant so they are load-
    # bearing in the comparison
    with torch.no_grad():
        for layer in hf.layers:
            layer.self_attn_layer_scale.scale.normal_(0.0, 0.5)
            layer.mlp_layer_scale.scale.normal_(0.0, 0.5)

    cfg = Qwen3TTSTokenizerDecoderConfig.from_dict(
        dict(
            latent_dim=HIDDEN,
            hidden_size=HIDDEN,
            intermediate_size=INTER,
            num_hidden_layers=LAYERS,
            num_attention_heads=HEADS,
            num_key_value_heads=KV_HEADS,
            head_dim=HEAD_DIM,
            sliding_window=WINDOW,
            rope_theta=10000.0,
            rms_norm_eps=1e-5,
        )
    )
    ours = DecoderTransformer(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    # our DecoderTransformer additionally owns input/output latent
    # projections (Qwen3-TTS specific); the HF transformer stack has none,
    # so load non-strict and assert every HF key landed (load_weights
    # always errors on unknown checkpoint keys).
    ours = load_weights(ours, sd, strict=False).eval()
    return hf, ours


@pytest.fixture(scope="module")
def pair():
    return _tiny_pair()


def _sliding_mask(t: int) -> jnp.ndarray:
    q = jnp.arange(t)[:, None]
    k = jnp.arange(t)[None, :]
    ok = (k <= q) & (q - k < WINDOW)
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[None, None]


def _run(hf, ours, t, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, t, HIDDEN)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(x),
                 use_cache=False).last_hidden_state.numpy()
    h = jnp.asarray(x)
    mask = _sliding_mask(t)
    for layer in ours.layers:
        h = layer(h, mask)
    h = np.asarray(ours.norm(h))
    np.testing.assert_allclose(h, ref, atol=2e-5, rtol=2e-5)


def test_code2wav_transformer_parity_beyond_window(pair):
    hf, ours = pair
    _run(hf, ours, t=3 * WINDOW, seed=0)  # window actually truncates


def test_code2wav_transformer_parity_short(pair):
    hf, ours = pair
    _run(hf, ours, t=WINDOW - 1, seed=1)  # pure causal regime
