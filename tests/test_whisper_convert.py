"""OpenAI whisper .pt → native checkpoint converter round trip."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.tree_util as jtu

from mlx_audio_tpu.nn.module import path_str
from mlx_audio_tpu.stt.models.whisper.convert import convert
from mlx_audio_tpu.stt.models.whisper.whisper import Model, ModelDimensions

DIMS = dict(
    n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=4,
    n_audio_layer=1, n_vocab=120, n_text_ctx=24, n_text_state=32,
    n_text_head=4, n_text_layer=1,
)


def test_openai_pt_roundtrip(tmp_path):
    m = Model(ModelDimensions.from_dict(DIMS))
    leaves, _ = jtu.tree_flatten_with_path(m)
    native = {path_str(p): np.asarray(v) for p, v in leaves}

    # synthesize the openai release format: torch conv layout (O, I, K),
    # encoder sinusoids included as a buffer
    state = {}
    for k, v in native.items():
        if k.endswith(("conv1.weight", "conv2.weight")) and v.ndim == 3:
            v = v.transpose(0, 2, 1)
        state[k] = torch.from_numpy(np.ascontiguousarray(v))
    state["encoder.positional_embedding"] = torch.zeros(1500, 32)
    pt = tmp_path / "tiny.pt"
    torch.save({"dims": DIMS, "model_state_dict": state}, pt)

    out = convert(str(pt), str(tmp_path / "converted"))

    import json

    cfg = json.loads((out / "config.json").read_text())
    assert cfg["model_type"] == "whisper"
    assert cfg["n_audio_state"] == 32

    from mlx_audio_tpu.utils import load_weight_files

    w = load_weight_files(out)
    loaded = Model(ModelDimensions.from_dict(cfg))
    from mlx_audio_tpu.nn.module import load_weights

    loaded = load_weights(loaded, loaded.sanitize(w), strict=True).eval()
    l2, _ = jtu.tree_flatten_with_path(loaded)
    restored = {path_str(p): np.asarray(v) for p, v in l2}
    for k, v in native.items():
        if "positional_embedding" in k and k.startswith("encoder"):
            continue  # recomputed sinusoids
        np.testing.assert_array_equal(restored[k], v, err_msg=k)


def test_torch_pickle_weight_loading(tmp_path):
    """Generic load_weight_files reads torch .pt/.bin state dicts."""
    from mlx_audio_tpu.utils import load_weight_files

    torch.save({"state_dict": {"a.weight": torch.ones(2, 3)}},
               tmp_path / "model.pt")
    w = load_weight_files(tmp_path)
    assert w["a.weight"].shape == (2, 3)
    assert isinstance(w["a.weight"], np.ndarray)
