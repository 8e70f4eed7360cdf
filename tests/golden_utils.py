"""Golden-fixture numerics pinning for families without an importable
torch twin (PARITY.md "no twin" rows).

A fixture stores BOTH the tiny model's weights and its outputs on fixed
inputs, generated once on the CPU backend. Thereafter the test loads the
stored weights into a freshly-constructed model, re-runs, and asserts the
outputs still match to 1e-5 — so a refactor that silently changes output
audio fails loudly. These are REGRESSION PINS against this repo's own
history, not cross-framework parity (see PARITY.md).

Fixture layout (compressed npz): ``w::<dotted-path>`` weight leaves
(buffers included) and ``out::<name>`` output arrays.
"""

from pathlib import Path

import numpy as np

from mlx_audio_tpu.nn.module import flatten_params, load_weights

GOLDEN_DIR = Path(__file__).parent / "golden"


def check_golden(name: str, model, run, atol: float = 1e-5,
                 rtol: float = 1e-5):
    """Pin `run(model)` (dict of name → array) against tests/golden/{name}.npz.

    Missing fixture → generate it and skip (commit the file; the next run
    verifies). Present → load stored weights into `model`, re-run, compare.
    """
    import pytest

    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        outs = {k: np.asarray(v) for k, v in run(model).items()}
        params = flatten_params(model, include_buffers=True)
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(
            path,
            **{f"w::{k}": np.asarray(v) for k, v in params.items()},
            **{f"out::{k}": v for k, v in outs.items()},
        )
        pytest.skip(f"golden fixture {name}.npz generated — rerun verifies")

    data = np.load(path)
    weights = {k[len("w::"):]: data[k] for k in data.files
               if k.startswith("w::")}
    pinned = load_weights(model, weights, strict=True)
    outs = {k: np.asarray(v) for k, v in run(pinned).items()}
    expected = {k[len("out::"):]: data[k] for k in data.files
                if k.startswith("out::")}
    assert set(outs) == set(expected), (
        f"golden {name}: output keys changed {sorted(outs)} vs "
        f"{sorted(expected)}")
    for k in sorted(expected):
        np.testing.assert_allclose(
            outs[k], expected[k], atol=atol, rtol=rtol,
            err_msg=f"golden {name}:{k} drifted — model numerics changed")
