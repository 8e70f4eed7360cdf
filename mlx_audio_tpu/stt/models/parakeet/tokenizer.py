"""SentencePiece-style vocabulary decode (spec: reference parakeet/tokenizer.py)."""


def decode(tokens, vocabulary):
    return "".join(vocabulary[t].replace("▁", " ") for t in tokens)
