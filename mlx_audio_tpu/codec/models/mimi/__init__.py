from .mimi import Mimi, MimiConfig, MimiStreamingDecoder, mimi_202407
