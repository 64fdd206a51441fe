#!/usr/bin/env python3
"""CLI: convert a HuggingFace Whisper checkpoint to Q4_0 GGUF.

Usage:
    python scripts/convert_whisper.py --model openai/whisper-large-v3 \
        --output models/whisper-large-v3-q4.gguf

Counterpart of the reference's scripts/convert_whisper.py; the conversion
logic lives in whisper_burn_tpu.gguf.convert.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from whisper_burn_tpu.gguf.convert import convert_hf_model


def main() -> None:
    parser = argparse.ArgumentParser(description="Convert Whisper to Q4_0 GGUF")
    parser.add_argument(
        "--model",
        default="openai/whisper-large-v3-turbo",
        help="HuggingFace model name or local path",
    )
    parser.add_argument("--output", default=None, help="Output GGUF path")
    args = parser.parse_args()

    output = args.output
    if output is None:
        output = f"models/{args.model.split('/')[-1]}-q4.gguf"
    convert_hf_model(args.model, output)
    print(f"wrote {output}")


if __name__ == "__main__":
    main()
