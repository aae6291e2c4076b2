"""Loud fused-kernel fallbacks.

Every fused Pallas kernel in this package silently routes unsupported
shapes to a dense XLA path. Correct, but a config change (new
resolution, channel count) used to lose 20%+ throughput with no log
line. Each gate now records the event here; the first occurrence per
(kernel, detail) prints one line when the Pallas path was actually
requested (impl == "pallas", i.e. on TPU), and bench.py asserts after
the timed run that no flagship shape fell back (fallbacks_seen()).

Gates run at trace time, so a process that jits a model exercises them
at least once even when the executable comes from the persistent cache.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

_seen: Dict[Tuple[str, str], int] = {}


def note_fallback(kernel: str, detail: str, loud: bool = True) -> None:
    """Record (and on first occurrence, print) a fused-kernel fallback.

    kernel: short name ("head_up4", "invpt_tail", ...); detail: why /
    what shape. loud=False records without printing (used when the
    caller knows the fallback is intended, e.g. CPU test runs).
    """
    key = (kernel, detail)
    first = key not in _seen
    _seen[key] = _seen.get(key, 0) + 1
    if first and loud and os.environ.get("MTT_QUIET_FALLBACK") != "1":
        print(f"[mtt_tpu] fused-kernel fallback: {kernel} -> dense XLA "
              f"({detail})", flush=True)


def fallbacks_seen() -> Dict[Tuple[str, str], int]:
    return dict(_seen)


def reset_fallbacks() -> None:
    _seen.clear()
