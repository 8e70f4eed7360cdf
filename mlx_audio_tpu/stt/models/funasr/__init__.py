from .funasr import (
    AudioAdaptor,
    FunASRConfig,
    Model,
    SenseVoiceEncoder,
    apply_cmvn,
    apply_lfr,
    log_mel_spectrogram,
)
