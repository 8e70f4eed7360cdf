"""Offline parity: BigVGAN generator vs transformers' Qwen2.5-Omni BigVGAN.

transformers ships an NVIDIA-BigVGAN generator (conv_pre → transpose-conv
upsamples → anti-aliased SnakeBeta AMP blocks → activation_post →
conv_post, clamp) as ``Qwen2_5OmniToken2WavBigVGANModel`` with the exact
key layout our codec expects (ups.N.0.*, resblocks.K.convs{1,2}.J.*,
resblocks.K.activations.J.act.{alpha,beta}). Its random-init
``state_dict()`` is run through our ``BigVGAN.sanitize`` + strict load
and the generated waveform must match — covering the kaiser-sinc
up/down anti-aliasing, SnakeBeta (log-scale), AMP residual wiring, and
transpose-conv upsampling (behavioral spec: reference
codec/models/bigvgan/bigvgan.py:29-149).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.codec.models.bigvgan.bigvgan import BigVGAN, BigVGANConfig
from mlx_audio_tpu.nn.module import load_weights

MELS = 8
C0 = 32
UP_RATES = [2, 2]
UP_KERNELS = [4, 4]
RES_KERNELS = [3, 5]
RES_DILATIONS = [[1, 3, 5], [1, 3, 5]]


def _tiny_pair():
    torch.manual_seed(5)
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniBigVGANConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniToken2WavBigVGANModel,
    )

    hf_cfg = Qwen2_5OmniBigVGANConfig(
        mel_dim=MELS,
        upsample_initial_channel=C0,
        upsample_rates=UP_RATES,
        upsample_kernel_sizes=UP_KERNELS,
        resblock_kernel_sizes=RES_KERNELS,
        resblock_dilation_sizes=RES_DILATIONS,
    )
    hf = Qwen2_5OmniToken2WavBigVGANModel(hf_cfg).eval()
    # move snake params off their all-zero init so they are load-bearing
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if name.endswith(".alpha") or name.endswith(".beta"):
                p.normal_(0.0, 0.3)

    cfg = BigVGANConfig.from_dict(
        dict(
            num_mels=MELS,
            upsample_initial_channel=C0,
            upsample_rates=UP_RATES,
            upsample_kernel_sizes=UP_KERNELS,
            resblock_kernel_sizes=RES_KERNELS,
            resblock_dilation_sizes=RES_DILATIONS,
            resblock="1",
            activation="snakebeta",
            snake_logscale=True,  # HF SnakeBeta always exponentiates
            use_tanh_at_final=False,  # HF clamps to [-1, 1]
            use_bias_at_final=False,  # HF conv_post has no bias
        )
    )
    ours = BigVGAN(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = load_weights(ours, ours.sanitize(sd), strict=True).eval()
    return hf, ours


@pytest.fixture(scope="module")
def pair():
    return _tiny_pair()


def test_bigvgan_waveform_parity(pair):
    hf, ours = pair
    rng = np.random.default_rng(0)
    T = 12
    mel = rng.standard_normal((1, MELS, T)).astype(np.float32)
    with torch.no_grad():
        mt = torch.from_numpy(mel)
        # HF's forward pre-processes the mel (exp → dB → normalize); feed
        # our generator the same processed features so the comparison
        # isolates the generator math.
        processed = hf.process_mel_spectrogram(mt)
        ref = hf(mt).numpy().reshape(1, -1, 1)
    x = jnp.swapaxes(jnp.asarray(processed.numpy()), 1, 2)  # (B, T, mels)
    out = np.asarray(ours(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_bigvgan_upsample_factor(pair):
    _, ours = pair
    x = jnp.zeros((1, 9, MELS))
    y = ours(x)
    assert y.shape == (1, 9 * int(np.prod(UP_RATES)), 1)
