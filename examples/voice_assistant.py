"""Voice assistant example: microphone → VAD → STT → LLM → TTS → speaker.

Mirrors the reference's sts/voice_pipeline.py `__main__` demo on our
component-pluggable pipeline, including barge-in (speaking over the
assistant cancels its reply).

    python examples/voice_assistant.py \
        --stt mlx-community/whisper-large-v3-turbo \
        --tts prince-canuma/Kokoro-82M

Without a microphone, pass --audio some.wav to run the loop offline.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stt", default="mlx-community/whisper-large-v3-turbo")
    p.add_argument("--tts", default="prince-canuma/Kokoro-82M")
    p.add_argument("--llm", default=None,
                   help="Optional LM checkpoint for replies (echoes without)")
    p.add_argument("--audio", default=None,
                   help="Run offline over a wav file instead of the mic")
    args = p.parse_args()

    from mlx_audio_tpu.stt.utils import load_model as load_stt
    from mlx_audio_tpu.sts.voice_pipeline import VoicePipeline
    from mlx_audio_tpu.tts.audio_player import AudioPlayer
    from mlx_audio_tpu.tts.utils import load_model as load_tts

    stt = load_stt(args.stt)
    tts = load_tts(args.tts)

    llm_generate = None
    if args.llm:
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from mlx_audio_tpu.lm import generate_tokens
        from mlx_audio_tpu.lm.transformer import CausalLM, LMConfig
        from mlx_audio_tpu.nn.module import load_weights
        from mlx_audio_tpu.utils import (
            get_model_path,
            load_config,
            load_weight_files,
        )

        path = get_model_path(args.llm)
        lm = CausalLM(LMConfig.from_dict(load_config(path)))
        lm = load_weights(lm, load_weight_files(path), strict=False).eval()
        tok = AutoTokenizer.from_pretrained(path)

        def llm_generate(text, history):
            prompt = tok.apply_chat_template(
                history, add_generation_prompt=True, tokenize=True)
            toks, n = generate_tokens(
                lm, jnp.asarray([prompt], jnp.int32), max_tokens=128,
                eos_token_ids=(tok.eos_token_id,))
            return tok.decode(
                [int(t) for t in toks[0][:n] if t != tok.eos_token_id],
                skip_special_tokens=True).strip()

    players = {}

    def on_audio(a, sr):
        if sr not in players:
            players[sr] = AudioPlayer(sample_rate=sr)
        players[sr].queue_audio(a)

    pipe = VoicePipeline(
        stt_model=stt,
        tts_model=tts,
        llm_generate=llm_generate,
        on_user_text=lambda t: print(f"you: {t}"),
        on_assistant_text=lambda t: print(f"assistant: {t}"),
        on_audio=on_audio,
    )
    if args.audio:
        from mlx_audio_tpu import audio_io
        from mlx_audio_tpu.utils import resample_audio

        x, sr = audio_io.read(args.audio)
        if x.ndim == 2:
            x = x.mean(axis=1)
        if sr != pipe.cfg.sample_rate:
            x = resample_audio(np.asarray(x, np.float32), sr,
                               pipe.cfg.sample_rate)
        for reply in pipe.run_on_audio(np.asarray(x, np.float32)):
            print(f"(reply) {reply}")
    else:
        pipe.run()


if __name__ == "__main__":
    main()
