"""Offline cross-framework parity: Sesame/CSM vs transformers (torch CPU).

Tiny random-init ``CsmForConditionalGeneration`` → ``state_dict()`` → key
map → our ``SesameModel`` must reproduce:
- backbone codebook-0 logits over summed audio-frame embeddings, and
- the depth decoder's per-codebook logits (inputs_embeds_projector +
  per-position codebooks_head)
(reference tts/models/sesame/sesame.py behavioral spec; the original csm-1b
shares one audio-embedding table between backbone and depth decoder, so the
HF depth table is tied to the backbone table here.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.tts.models.sesame.sesame import ModelConfig, SesameModel

K = 4  # codebooks
V = 35  # audio vocab
TEXT_V = 60
ROPE_SCALING = {
    "rope_type": "llama3", "factor": 32.0, "low_freq_factor": 1.0,
    "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
}


def _hf_model(seed: int):
    torch.manual_seed(seed)
    depth = dict(
        num_codebooks=K, vocab_size=V, backbone_hidden_size=32,
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        rope_theta=500000.0, max_position_embeddings=K + 2,
        rope_scaling=None,
    )
    mimi = dict(  # unused by the test; keep it tiny
        model_type="mimi",
        num_quantizers=2, codebook_size=32, codebook_dim=8, hidden_size=16,
        intermediate_size=32, num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, head_dim=8, sampling_rate=24000,
        audio_channels=1, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[4, 2], vector_quantization_hidden_dimension=8,
        num_semantic_quantizers=1, upsample_groups=4,
    )
    cfg = transformers.CsmConfig(
        num_codebooks=K, vocab_size=V, text_vocab_size=TEXT_V,
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        rope_scaling=ROPE_SCALING, depth_decoder_config=depth,
        codec_config=mimi,
    )
    hf = transformers.CsmForConditionalGeneration(cfg).eval()
    # the original csm-1b shares ONE audio table; tie HF's copy
    with torch.no_grad():
        hf.depth_decoder.model.embed_tokens.weight.copy_(
            hf.backbone_model.embed_tokens.embed_audio_tokens.weight)
    return hf


def _ours_from(hf) -> SesameModel:
    model = SesameModel(ModelConfig.from_dict(dict(
        text_vocab_size=TEXT_V, audio_vocab_size=V, audio_num_codebooks=K,
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        rms_norm_eps=1e-5, rope_theta=500000.0, rope_scaling=ROPE_SCALING,
        vocab_size=TEXT_V,
        depth_decoder_config=dict(
            num_codebooks=K, vocab_size=V, backbone_hidden_size=32,
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            rope_theta=500000.0, max_position_embeddings=K + 2,
        ),
    )))
    weights = {}
    for k, v in hf.state_dict().items():
        if k.startswith("codec_model."):
            continue
        v = v.detach().numpy()
        if k == "embed_text_tokens.weight":
            weights["text_embeddings.weight"] = v
        elif k == "backbone_model.embed_tokens.embed_audio_tokens.weight":
            weights["audio_embeddings.weight"] = v
        elif k.startswith("backbone_model."):
            weights["backbone." + k[len("backbone_model."):]] = v
        elif k == "depth_decoder.model.embed_tokens.weight":
            continue  # tied to audio_embeddings above
        elif k == "depth_decoder.model.inputs_embeds_projector.weight":
            weights["projection.weight"] = v
        elif k == "depth_decoder.codebooks_head.weight":
            weights["audio_head"] = v
        elif k.startswith("depth_decoder.model."):
            weights["decoder." + k[len("depth_decoder.model."):]] = v
        elif k == "lm_head.weight":
            weights["codebook0_head.weight"] = v
        else:
            raise AssertionError(f"unmapped HF key {k}")
    return load_weights(model, weights, strict=True).eval()


def test_backbone_codebook0_logits_parity():
    hf = _hf_model(17)
    ours = _ours_from(hf)

    rng = np.random.default_rng(3)
    frames = rng.integers(0, V, (1, 6, K)).astype(np.int64)

    with torch.no_grad():
        h = hf.backbone_model(
            input_ids=torch.from_numpy(frames)).last_hidden_state
        ref = hf.lm_head(h).numpy()

    # ours: audio-only frames — text column masked out
    tokens = jnp.concatenate(
        [jnp.asarray(frames, jnp.int32), jnp.zeros((1, 6, 1), jnp.int32)],
        axis=2)
    mask = jnp.concatenate(
        [jnp.ones((1, 6, K), bool), jnp.zeros((1, 6, 1), bool)], axis=2)
    emb = ours.embed_frames(tokens, mask)
    hidden, _ = ours.backbone(emb)
    got = np.asarray(ours.codebook0_head(hidden))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_depth_decoder_logits_parity():
    hf = _hf_model(29)
    ours = _ours_from(hf)

    rng = np.random.default_rng(7)
    h32 = rng.standard_normal((1, 32)).astype(np.float32)
    codes = rng.integers(0, V, (K - 1,)).tolist()  # c0..c2 teacher-forced

    with torch.no_grad():
        out = hf.depth_decoder(
            input_ids=torch.tensor([[0] + codes]),
            backbone_last_hidden_state=torch.from_numpy(h32))
        ref = out.logits.numpy()  # per-position codebooks_head logits

    # ours: seq = [h, emb(c0 + 0V), emb(c1 + 1V), emb(c2 + 2V)] projected
    embeds = [jnp.asarray(h32)]
    for i, c in enumerate(codes):
        embeds.append(ours.audio_embeddings(jnp.asarray([c + i * V])))
    seq = ours.projection(jnp.stack(embeds, axis=1))
    hidden, _ = ours.decoder(seq)
    got = np.stack([
        np.asarray(jnp.einsum("d,dv->v", hidden[0, p], ours.audio_head[p - 1]))
        for p in range(1, K)
    ])[None]
    assert got.shape == ref[:, -(K - 1):].shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref[:, -(K - 1):], atol=2e-5, rtol=1e-5)
