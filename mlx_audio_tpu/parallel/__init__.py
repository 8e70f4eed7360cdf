from .mesh import (
    get_mesh,
    replicate,
    shard_module,
    LLAMA_TP_RULES,
    data_parallel_call,
)
