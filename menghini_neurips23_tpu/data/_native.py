"""Build/load glue for the C++ fast loader (native/fastloader.cpp).

The extension is compiled on demand with g++ against libjpeg/libpng (both in
the base image) into native/.  Set MNT_NATIVE_LOADER=0 to disable, =1 to
require; default is auto (use it when the toolchain builds it).
"""

from __future__ import annotations

import importlib
import logging
import os
import subprocess
import sys
import sysconfig
import threading

log = logging.getLogger(__name__)

_lock = threading.Lock()
_module = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "fastloader.cpp")
    if not os.path.exists(src):
        return False
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_NATIVE_DIR, f"_fastloader{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        src, f"-I{include}", "-ljpeg", "-lpng", "-pthread", "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:
        log.warning("native loader build failed: %s", e)
        return False


def get_fastloader():
    """Returns the _fastloader module or None."""
    global _module, _tried
    flag = os.environ.get("MNT_NATIVE_LOADER", "auto")
    if flag == "0":
        return None
    with _lock:
        if _tried:
            return _module
        _tried = True
        if _build():
            if _NATIVE_DIR not in sys.path:
                sys.path.insert(0, _NATIVE_DIR)
            try:
                _module = importlib.import_module("_fastloader")
                log.info("native C++ fast loader enabled")
            except Exception as e:
                log.warning("native loader import failed: %s", e)
                _module = None
        if _module is None and flag == "1":
            raise RuntimeError("MNT_NATIVE_LOADER=1 but the native loader is unavailable")
        return _module
