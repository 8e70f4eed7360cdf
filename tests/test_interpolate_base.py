"""tts/models/interpolate.py + tts/models/base.py adjust_speed.

Mirrors reference tts/tests/test_interpolate.py and test_base.py; the
linear/nearest modes are additionally pinned to torch.nn.functional.
interpolate as the golden oracle (the reference reimplements torch's
formulas — see reference tts/models/interpolate.py).
"""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.base import adjust_speed
from mlx_audio_tpu.tts.models.interpolate import interpolate

import jax.numpy as jnp


def test_input_validation():
    with pytest.raises(ValueError):
        interpolate(jnp.zeros((2, 3)), size=4)
    with pytest.raises(ValueError):
        interpolate(jnp.zeros((2, 3, 4)), size=8, scale_factor=2)
    with pytest.raises(ValueError):
        interpolate(jnp.zeros((2, 3, 4)))
    with pytest.raises(ValueError):
        interpolate(jnp.zeros((2, 3, 4, 5)), size=8)
    with pytest.raises(ValueError):
        interpolate(jnp.zeros((2, 3, 4)), size=8, mode="cubic")


def test_size_and_scale_factor():
    assert interpolate(jnp.zeros((2, 3, 4)), size=8).shape == (2, 3, 8)
    assert interpolate(
        jnp.zeros((2, 3, 4)), scale_factor=2).shape == (2, 3, 8)


def test_nearest_reference_values():
    x = jnp.asarray([[[1.0, 2.0, 3.0, 4.0]]])
    up = np.asarray(interpolate(x, size=8, mode="nearest"))
    np.testing.assert_allclose(
        up, [[[1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0]]], rtol=1e-5)
    down = np.asarray(interpolate(x, size=2, mode="nearest"))
    np.testing.assert_allclose(down, [[[1.0, 3.0]]], rtol=1e-5)


@pytest.mark.parametrize("mode,align", [("nearest", None),
                                        ("linear", False),
                                        ("linear", True)])
@pytest.mark.parametrize("size", [3, 7, 16])
def test_matches_torch(mode, align, size):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 8)).astype(np.float32)
    kwargs = {} if align is None else {"align_corners": align}
    ref = F.interpolate(torch.from_numpy(x), size=size, mode=mode,
                        **kwargs).numpy()
    got = np.asarray(interpolate(
        jnp.asarray(x), size=size, mode=mode,
        align_corners=bool(align)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_adjust_speed():
    audio = np.sin(np.linspace(0, 20, 24_000)).astype(np.float32)
    assert adjust_speed(audio, 1.0) is audio
    fast = adjust_speed(audio, 2.0)
    assert len(fast) == 12_000 and fast.dtype == np.float32
    slow = adjust_speed(audio, 0.5)
    assert len(slow) == 48_000
    # energy is preserved approximately (pure resample, no pitch shift)
    assert abs(np.abs(fast).mean() - np.abs(audio).mean()) < 0.05
