from .module import (
    Module,
    build_on_host,
    cast_floats,
    flatten_params,
    load_weights,
    path_str,
)
from .layers import seed_rng
from .layers import (
    AvgPool1d,
    BatchNorm,
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    ConvTranspose2d,
    Dropout,
    Embedding,
    GroupNorm,
    Identity,
    InstanceNorm,
    LayerNorm,
    Linear,
    MaxPool1d,
    RMSNorm,
    Sequential,
)
from .quantized import (
    QuantizedEmbedding,
    QuantizedLinear,
    dequantize_arrays,
    quantize_arrays,
    quantize_module,
)
from .recurrent import GRU, LSTM, BiLSTM, lstm_scan
from .activations import (
    ELU,
    GELU,
    GLU,
    LeakyReLU,
    Mish,
    ReLU,
    Sigmoid,
    SiLU,
    Softplus,
    Tanh,
    gelu,
    gelu_tanh,
    mish,
    silu,
    snake,
    snake_beta,
)
