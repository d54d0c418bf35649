"""Native (C++) runtime components, built on demand with the system g++.

The reference assembles ~25 native dependencies via tools/Makefile; this
package holds their TPU-framework equivalents (scorer kernels, data-plane
helpers) compiled at first use and loaded through ctypes, with pure-python
fallbacks when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

logger = logging.getLogger("espnet_tpu")

_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIBS = {}


def load_library(name: str, sources) -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen lib<name>.so from C++ sources."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _DIR / f"lib{name}.so"
        srcs = [_DIR / s for s in sources]
        try:
            if not so.exists() or any(
                s.stat().st_mtime > so.stat().st_mtime for s in srcs
            ):
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                       "-o", str(so)] + [str(s) for s in srcs]
                subprocess.run(cmd, check=True, capture_output=True)
                logger.info("built native library %s", so.name)
            lib = ctypes.CDLL(str(so))
        except Exception as e:  # no compiler / build failure -> fallback
            logger.warning("native %s unavailable (%s); using python "
                           "fallback", name, e)
            lib = None
        _LIBS[name] = lib
        return lib
