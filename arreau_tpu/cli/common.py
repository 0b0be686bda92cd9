"""Shared argparse value parsers for the CLIs.

The reference CLIs use ``type=eval`` for boolean/optional knobs
(/root/reference/main_diffusion.py:31-90 idiom); ``eval`` accepts arbitrary
expressions, crashes on ``true``/``false`` spellings, and silently produces
non-bool values (``eval('1') -> 1``). These parsers keep the same accepted
surface (``True``/``False``/``None``/floats) while rejecting everything else
with a proper argparse error.
"""

from __future__ import annotations

import argparse


def parse_bool(value: str) -> bool:
    """True/False (case-insensitive; also 1/0, yes/no)."""
    s = str(value).strip().lower()
    if s in ("true", "1", "yes"):
        return True
    if s in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")


def parse_opt_bool(value: str):
    """None | True | False (tri-state knobs like --scan_epoch)."""
    s = str(value).strip().lower()
    if s in ("none", ""):
        return None
    return parse_bool(value)


def parse_opt_float(value: str):
    """None | float (knobs like --radius where None means fully-connected)."""
    s = str(value).strip().lower()
    if s in ("none", ""):
        return None
    try:
        return float(value)
    except ValueError:
        raise argparse.ArgumentTypeError(f"expected a float or None, got {value!r}")
