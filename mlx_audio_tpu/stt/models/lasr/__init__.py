from ..lasr_ctc.lasr import Model, ModelConfig, LasrForCTC, LasrEncoder
