"""CLI config entry point.

Parity with the reference's ``parse_config`` (``genrec/modules/utils.py:85-117``):
a positional gin file, a ``--split`` flag whose value is substituted for every
literal ``{split}`` occurrence in the config text, and repeatable ``--gin``
binding overrides applied after the file.
"""

from __future__ import annotations

import argparse
import os

from . import gin


def parse_config(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="genrec-tpu trainer")
    parser.add_argument("config", help="Path to a .gin config file")
    parser.add_argument("--split", default="beauty",
                        help="Dataset split substituted for {split}")
    parser.add_argument("--gin", action="append", default=[],
                        metavar="BINDING",
                        help="Extra gin binding, e.g. \"train.epochs=1\"")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        text = f.read()
    text = text.replace("{split}", args.split)
    gin.parse_config(text, base_dir=os.path.dirname(
        os.path.abspath(args.config)))
    for binding in args.gin:
        gin.parse_config(binding.replace("{split}", args.split))
    return args
