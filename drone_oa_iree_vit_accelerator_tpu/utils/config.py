"""configargparse-style ``key = value`` config files (no dependency).

The reference drives training with configargparse .txt files
(training/config/train.txt, qat.txt; reference training/qa_train.py:
98-138). This reader accepts the same format: one ``key = value`` per
line, ``#`` comments, booleans/ints/floats auto-coerced; CLI flags
override file values.
"""

from __future__ import annotations

import argparse
from typing import Any


def parse_config_file(path: str) -> dict[str, Any]:
    out: dict[str, Any] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, val = (s.strip() for s in line.split("=", 1))
            out[key] = _coerce(val)
    return out


def _coerce(val: str) -> Any:
    low = val.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    return val


def parse_with_config(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """Parse CLI args; if --config is given, file values fill defaults
    (CLI still wins), mirroring configargparse precedence."""
    parser.add_argument("--config", default=None)
    args, _ = parser.parse_known_args(argv)
    if args.config:
        file_vals = parse_config_file(args.config)
        known = {a.dest for a in parser._actions}
        parser.set_defaults(**{k: v for k, v in file_vals.items() if k in known})
    return parser.parse_args(argv)
