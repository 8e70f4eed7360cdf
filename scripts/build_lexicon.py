#!/usr/bin/env python
"""Build the Kokoro fallback pronunciation lexicon from a CMUdict file.

Usage:
    python scripts/build_lexicon.py /path/to/cmudict-0.7b \
        [mlx_audio_tpu/tts/models/kokoro/data/lexicon_en.json.gz]

Converts the public-domain CMU Pronouncing Dictionary (~134k entries,
http://www.speech.cs.cmu.edu/cgi-bin/cmudict) to the compact misaki-IPA
json the fallback G2P loads at runtime (see kokoro/lexicon.py). Run once
at image/build time; the output is ~1.5 MB gzipped. No network access is
performed — you supply the cmudict file.
"""

import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from mlx_audio_tpu.tts.models.kokoro.lexicon import lexicon_from_cmudict


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    src = sys.argv[1]
    default_out = (Path(__file__).parent.parent / "mlx_audio_tpu" / "tts"
                   / "models" / "kokoro" / "data" / "lexicon_en.json.gz")
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else default_out
    lex = lexicon_from_cmudict(src)
    out.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(out, "wt", encoding="utf-8") as f:
        json.dump(lex, f, ensure_ascii=False, separators=(",", ":"))
    print(f"wrote {len(lex)} entries to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
