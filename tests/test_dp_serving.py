"""DP-replicated serving (parallel/serving.DPReplicaPool): one replica +
batcher per device, round-robin dispatch, batched == sequential."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def lm():
    import jax.numpy as jnp

    from mlx_audio_tpu.lm import CausalLM, LMConfig
    from mlx_audio_tpu.nn import seed_rng

    seed_rng(31)
    return CausalLM(LMConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=96))


def test_pool_round_robins_and_matches_solo(lm):
    import jax

    from mlx_audio_tpu.lm.continuous import ContinuousBatcher
    from mlx_audio_tpu.parallel.serving import DPReplicaPool

    devices = jax.devices()[:4]
    assert len(devices) == 4  # conftest forces the 8-device CPU mesh
    pool = DPReplicaPool(
        lm, lambda m: ContinuousBatcher(m, slots=2, max_len=64,
                                        cache_dtype=np.float32),
        devices=devices)
    try:
        prompt = [1, 2, 3]
        futs = [pool.submit(prompt, max_tokens=5) for _ in range(8)]
        outs = [f.result(timeout=600) for f in futs]
        assert all(c == 2 for c in pool.request_counts)
        # replica weights are identical copies → identical greedy decodes
        solo = ContinuousBatcher(lm, slots=1, max_len=64,
                                 cache_dtype=np.float32)
        try:
            ref = solo.submit(prompt, max_tokens=5).result(timeout=600)
        finally:
            solo.close()
        assert all(o == ref for o in outs)
        # every replica actually executed on its own device
        for i, rep in enumerate(pool.replicas):
            leaf = jax.tree_util.tree_leaves(rep)[0]
            assert list(leaf.devices())[0] == devices[i]
    finally:
        pool.close()


def test_provider_boots_pool_under_env(lm, monkeypatch):
    import jax

    from mlx_audio_tpu import server as srv
    from mlx_audio_tpu import utils as U
    from mlx_audio_tpu.lm.continuous import ContinuousBatcher
    from mlx_audio_tpu.nn.module import Module
    from mlx_audio_tpu.serving import get_infer_hook

    class Wrap(Module):
        def __init__(self, inner):
            self.lm = inner

        def make_batcher(self, **kw):
            return ContinuousBatcher(self.lm, slots=2, max_len=64,
                                     cache_dtype=np.float32)

    host = Wrap(lm)
    monkeypatch.setattr(U, "load_model", lambda name, **kw: host)
    monkeypatch.setenv("MLX_AUDIO_TPU_DP", "2")
    provider = srv.ModelProvider()
    served = provider.load_model("dp-test")
    pool = get_infer_hook(served)
    assert type(pool).__name__ == "DPReplicaPool"
    assert len(pool.batchers) == 2
    futs = [pool.submit([4, 5], max_tokens=3) for _ in range(4)]
    outs = [f.result(timeout=600) for f in futs]
    assert len({tuple(o) for o in outs}) == 1
    assert provider.unload("dp-test")  # tears the pool down
    assert get_infer_hook(served) is None
