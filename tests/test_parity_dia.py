"""Offline cross-framework parity: Dia vs transformers (torch CPU).

Tiny random-init ``DiaForConditionalGeneration`` → ``state_dict()`` → key/
layout map into our ``DiaModel`` (DenseGeneral weights are the torch Linear
transposed + reshaped; the HF fused multichannel embedding/logits tables are
split per channel); encoder states and decoder logits must match.

NOTE on cross-attention RoPE: the reference (tts/models/dia/layers.py:324,
:677 — our behavioral spec, mirroring the nari-labs original) applies rotary
embeddings to cross-attention queries (target positions) and keys (source
positions). transformers' Dia port applies NO rope in cross-attention. The
decoder test therefore runs at all-zero positions (rope = identity on both
sides), which still verifies every weight mapping, the GQA self-attention,
norms, gated MLP, multichannel embedding sum and the per-channel logits
head; rope itself is verified with real positions in the encoder test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.tts.models.dia.config import DiaConfig
from mlx_audio_tpu.tts.models.dia.layers import DiaModel

C, V, SRC_V = 3, 40, 60


def _tiny_pair():
    from transformers.models.dia import configuration_dia as dc

    torch.manual_seed(5)
    enc = dc.DiaEncoderConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=16, intermediate_size=64,
        vocab_size=SRC_V, max_position_embeddings=32,
    )
    dec = dc.DiaDecoderConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=1, head_dim=16, cross_num_attention_heads=2,
        cross_head_dim=16, cross_num_key_value_heads=2, cross_hidden_size=32,
        intermediate_size=64, vocab_size=V, num_channels=C,
        max_position_embeddings=16,
    )
    hf = transformers.DiaForConditionalGeneration(
        dc.DiaConfig(encoder_config=enc, decoder_config=dec,
                     delay_pattern=[0, 1, 2])
    ).eval()

    cfg = DiaConfig.load_dict(dict(
        model=dict(
            encoder=dict(n_layer=2, n_embd=32, n_hidden=64, n_head=2,
                         head_dim=16),
            decoder=dict(n_layer=2, n_embd=32, n_hidden=64,
                         gqa_query_heads=2, kv_heads=1, gqa_head_dim=16,
                         cross_query_heads=2, cross_head_dim=16),
            src_vocab_size=SRC_V, tgt_vocab_size=V,
        ),
        data=dict(channels=C, delay_pattern=[0, 1, 2]),
    ))
    model = DiaModel(cfg)

    def dg(w, in_shape, out_shape):
        """torch Linear (out, in) → DenseGeneral (in..., out...)."""
        return w.T.reshape(*in_shape, *out_shape)

    weights = {}
    for k, t in hf.state_dict().items():
        v = t.detach().numpy()
        if k == "logits_dense.weight":  # (C*V, D) → (D, C, V)
            weights["decoder.logits_dense.weight"] = dg(v, (32,), (C, V))
        elif k == "model.decoder.embeddings.embed.weight":  # (C*V, D)
            for i in range(C):
                weights[f"decoder.embeddings.{i}.weight"] = v[i * V:(i + 1) * V]
        elif k.endswith(("q_proj.weight", "k_proj.weight", "v_proj.weight")):
            nh = v.shape[0] // 16
            weights[k[len("model."):]] = dg(v, (v.shape[1],), (nh, 16))
        elif k.endswith("o_proj.weight"):
            nh = v.shape[1] // 16
            weights[k[len("model."):]] = dg(v, (nh, 16), (v.shape[0],))
        elif k.endswith("gate_up_proj.weight"):  # (2*I, D) → (D, 2, I)
            base = k[len("model."):].rsplit(".", 2)[0]
            weights[base + ".wi_fused.weight"] = dg(v, (v.shape[1],), (2, 64))
        elif k.endswith("down_proj.weight"):  # (D, I) → (I, D)
            base = k[len("model."):].rsplit(".", 2)[0]
            weights[base + ".wo.weight"] = v.T
        else:
            weights[k[len("model."):]] = v
    model = load_weights(model, weights, strict=True).eval()
    return hf, model


@pytest.fixture(scope="module")
def dia_pair():
    return _tiny_pair()


def test_encoder_parity(dia_pair):
    hf, model = dia_pair
    rng = np.random.default_rng(0)
    src = rng.integers(0, SRC_V, size=(1, 12)).astype(np.int64)
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(src)).last_hidden_state.numpy()
    pos = jnp.arange(12)[None]
    ours = np.asarray(model.encoder(jnp.asarray(src, jnp.int32), pos))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_decoder_logits_parity(dia_pair):
    hf, model = dia_pair
    rng = np.random.default_rng(1)
    src = rng.integers(0, SRC_V, size=(1, 10)).astype(np.int64)
    tgt = rng.integers(0, V, size=(1, 7, C)).astype(np.int64)
    zero_pos = np.zeros((1, 7), np.int64)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(src),
            decoder_input_ids=torch.from_numpy(tgt),
            decoder_position_ids=torch.from_numpy(zero_pos),
        ).logits.numpy()  # (C, 7, V) — channel-major

    enc_pos = jnp.arange(10)[None]
    enc_out = model.encoder(jnp.asarray(src, jnp.int32), enc_pos)
    # zero src positions → cross-k rope is identity (see module docstring)
    cross_kvs = model.decoder.precompute_cross_kv(
        enc_out, jnp.zeros((1, 10), jnp.int32)
    )
    logits, _ = model.decoder(
        jnp.asarray(tgt, jnp.int32), jnp.asarray(zero_pos, jnp.int32),
        None, cross_kvs, self_mask="causal",
    )  # (1, 7, C, V)
    ours = np.moveaxis(np.asarray(logits)[0], 1, 0)  # (C, 7, V)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)
