"""Bark tests: tiny 3-stage pipeline with injected tokenizer/codec."""

import numpy as np
import pytest


class FakeBert:
    def encode(self, text, add_special_tokens=False):
        return [(ord(c) % 90) + 1 for c in text[:40]]


class FakeCodec:
    def decode(self, codes, scales=None):
        T = np.asarray(codes).shape[-1]
        return np.zeros((1, 1, T * 320), np.float32)


@pytest.fixture(scope="module")
def bark():
    from mlx_audio_tpu.tts.models.bark import Model, ModelConfig

    gcfg = dict(block_size=1024, n_layer=1, n_head=2, n_embd=32, bias=False)
    cfg = ModelConfig.from_dict(dict(
        semantic_config={**gcfg, "input_vocab_size": 129600,
                         "output_vocab_size": 129600},
        coarse_acoustics_config={**gcfg, "input_vocab_size": 12096,
                                 "output_vocab_size": 12096},
        fine_acoustics_config={**gcfg, "input_vocab_size": 1056,
                               "output_vocab_size": 1056,
                               "n_codes_total": 8, "n_codes_given": 1},
    ))
    m = Model(cfg)
    m.set_runtime(tokenizer=FakeBert(), codec=FakeCodec())
    return m


def test_semantic_stage(bark):
    out = bark.generate_text_semantic("hi", None, temperature=0.7)
    assert out.ndim == 1
    assert (out >= 0).all() and (out < 10000).all()


def test_coarse_stage_ranges(bark):
    sem = np.random.default_rng(0).integers(0, 10000, 40).astype(np.int32)
    coarse = bark.generate_coarse(sem, None, sliding_window_len=20)
    assert coarse.shape[0] == 2
    assert (coarse >= 0).all() and (coarse < 1024).all()
    # ~1.5 coarse frames per semantic token
    assert 20 <= coarse.shape[1] <= 70


def test_fine_stage(bark):
    coarse = np.random.default_rng(1).integers(0, 1024, (2, 30)).astype(np.int32)
    fine = bark.generate_fine(coarse, None)
    assert fine.shape == (8, 30)
    np.testing.assert_array_equal(fine[:2], coarse)
    assert (fine >= 0).all() and (fine < 1024).all()


def test_generate_end_to_end(bark):
    results = list(bark.generate("Hello.", temperature=0.7))
    for r in results:
        assert r.sample_rate == 24000
        assert r.samples > 0


def test_sanitize_gpt_keys(bark):
    w = {"semantic.transformer.h.0.attn.c_attn.weight": np.zeros((3, 3)),
         "semantic.transformer.wte.weight": np.zeros((10, 4)),
         "fine_acoustics._orig_mod.transformer.ln_f.weight": np.zeros(4)}
    out = bark.sanitize(w)
    assert "semantic.layers.0.attn.att_proj.weight" in out
    assert "semantic.input_embeds_layer.weight" in out
    assert "fine_acoustics.layernorm_final.weight" in out


# ---------------------------------------------------------------------------
# Stage-stacked batching (BarkBatcher)
# ---------------------------------------------------------------------------


def test_bark_batcher_batched_equals_solo(bark):
    """Concurrent generate() calls fuse at every stage; a request's audio
    equals running it alone through an equally-sized pool (per-row PRNG
    streams)."""
    import threading

    texts = ["hello there", "bark batching"]
    seeds = [5, 9]

    def run_pool(jobs):
        b = bark.make_batcher(max_batch=2, window_ms=40.0).install()
        outs = [None] * len(jobs)
        try:
            def run(i, t, s):
                outs[i] = [r.audio for r in bark.generate(
                    t, temperature=0.7, seed=s)]

            ths = [threading.Thread(target=run, args=(i, t, s))
                   for i, (t, s) in enumerate(jobs)]
            [th.start() for th in ths]
            [th.join(timeout=600) for th in ths]
            assert b.dispatch_count >= 3  # all three stages dispatched
        finally:
            b.close()
        return outs

    batched = run_pool(list(zip(texts, seeds)))
    for i, job in enumerate(zip(texts, seeds)):
        solo = run_pool([job])[0]
        assert len(batched[i]) == len(solo)
        for a, b_ in zip(batched[i], solo):
            np.testing.assert_array_equal(a, b_)
