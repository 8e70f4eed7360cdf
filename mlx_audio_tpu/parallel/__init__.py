from .mesh import (
    get_mesh,
    replicate,
    shard_module,
    DIT_TP_RULES,
    LLAMA_TP_RULES,
    data_parallel_call,
    shard_sequence,
)
from .pipeline import pipeline_forward, shard_stacked_layers, stack_layers
from .train import (
    PipelinedLM,
    lm_loss,
    make_train_step,
    pp_lm_logits,
    split_causal_lm,
)
from .checkpoint import restore_train_state, save_train_state
