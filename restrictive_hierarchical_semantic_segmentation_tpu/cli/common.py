"""Shared CLI helpers."""


def parse_bool(s) -> bool:
    """The reference CLIs take booleans as strings (``--inc-cross-val True``,
    train.py argparse type=str); one parser so every CLI agrees on what
    counts as true."""
    return str(s).lower() in ("true", "1", "yes")
