#!/usr/bin/env python
"""Reproducible LoC counter — the canonical numbers for README/VERDICT
comparisons (the driver's PROGRESS.jsonl counter uses its own rules;
this script is the repo's reproducible definition).

- source: non-test framework code (mlx_audio_tpu/ + native/ + bench.py +
  __graft_entry__.py), .py/.cpp/.c/.h/Makefile
- tests: tests/**/*.py
- scripts/docs counted separately.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def count(patterns):
    total, files = 0, 0
    for pat in patterns:
        for f in sorted(REPO.glob(pat)):
            if f.is_file():
                total += sum(1 for _ in f.open(errors="replace"))
                files += 1
    return total, files


def main():
    groups = {
        "source": ["mlx_audio_tpu/**/*.py", "native/**/*.cpp",
                   "native/**/*.h", "native/**/*.c", "native/Makefile",
                   "bench.py", "__graft_entry__.py"],
        "tests": ["tests/**/*.py"],
        "scripts": ["scripts/**/*.py"],
        "docs": ["*.md", "docs/**/*.md"],
    }
    for name, pats in groups.items():
        loc, files = count(pats)
        print(f"{name:8} {loc:7} lines in {files} files")


if __name__ == "__main__":
    main()
