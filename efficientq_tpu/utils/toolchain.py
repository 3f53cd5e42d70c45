"""Toolchain fingerprint for experiment records.

2-bit quantization basins are sub-ulp sensitive: a jax/libtpu bump can
retrain the gate FP net to a slightly different point and flip a W4A4
draw across a basin boundary with zero repo changes (measured r4:
FP 0.799 -> 0.8072 flipped draw 1 from 0.555 to 0.482 —
docs/quantization.md).  Every experiments/*.json therefore records the
toolchain that produced it, so a drifted re-run is attributable to the
toolchain instead of silently overwriting the old truth.
"""
from __future__ import annotations

import importlib.metadata as _md
import platform
from typing import Dict


def _dist_version(*names: str) -> str:
    for n in names:
        try:
            return _md.version(n)
        except Exception:
            continue
    return "absent"


def toolchain_fingerprint() -> Dict[str, str]:
    """Versions that can move quantization basins: jax/jaxlib (tracing +
    XLA), libtpu (Mosaic + TPU compiler), python, and the backend the run
    actually used."""
    import jax

    try:
        backend = jax.default_backend()
    except Exception:  # no devices initialisable (e.g. doc builds)
        backend = "uninitialised"
    return {
        "jax": _dist_version("jax"),
        "jaxlib": _dist_version("jaxlib"),
        "libtpu": _dist_version("libtpu", "libtpu-nightly"),
        "flax": _dist_version("flax"),
        "python": platform.python_version(),
        "backend": backend,
    }
