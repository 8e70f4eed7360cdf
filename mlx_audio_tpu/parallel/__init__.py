from .mesh import (
    get_mesh,
    replicate,
    shard_module,
    DIT_TP_RULES,
    LLAMA_TP_RULES,
    data_parallel_call,
    shard_sequence,
)
