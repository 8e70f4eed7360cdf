

def test_subtitle_word_options(tmp_path):
    """Word-timestamp subtitle options (reference writers.py:76-180):
    max_line_width wraps lines, max_line_count breaks cues,
    highlight_words underlines the active word."""
    from mlx_audio_tpu.stt.models.base import STTOutput
    from mlx_audio_tpu.stt.models.whisper.writers import WriteSRT, WriteVTT

    words = [{"word": f" w{i}", "start": i * 0.5, "end": i * 0.5 + 0.4}
             for i in range(6)]
    result = STTOutput(
        text=" ".join(w["word"].strip() for w in words),
        segments=[{"start": 0.0, "end": 3.0,
                   "text": " ".join(w["word"] for w in words),
                   "words": words}],
        language="en")

    srt = WriteSRT(str(tmp_path))
    # width 5 fits two words per line; 1 line per cue → 3 cues of 2 words
    out = srt(result, "a.wav", max_line_width=5, max_line_count=1)
    content = out.read_text()
    assert content.count(" --> ") == 3
    # width 8, 2 lines per cue → one cue with an embedded line break
    out_wide = srt(result, "a2.wav", max_line_width=8, max_line_count=2)
    wide = out_wide.read_text()
    assert wide.count(" --> ") == 1 and "w2\nw3" in wide

    vtt = WriteVTT(str(tmp_path))
    out2 = vtt(result, "b.wav", highlight_words=True)
    c2 = out2.read_text()
    assert "<u>" in c2 and c2.count("<u>") >= 6

    # no word timings: falls back to segment cues
    plain = STTOutput(text="hi", segments=[
        {"start": 0.0, "end": 1.0, "text": "hi"}], language="en")
    out3 = srt(plain, "c.wav")
    assert "00:00:00,000 --> 00:00:01,000" in out3.read_text()
