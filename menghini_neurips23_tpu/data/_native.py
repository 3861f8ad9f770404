"""Build/load glue for the native C++ extensions (native/*.cpp).

Extensions are compiled on demand with g++ (libjpeg/libpng are in the base
image) into native/.  Set MNT_NATIVE_LOADER=0 to disable, =1 to require;
default is auto (use them when the toolchain builds them).
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
_modules: dict = {}

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)

_SOURCES = {
    "_fastloader": ("fastloader.cpp", ["-ljpeg", "-lpng"]),
    "_leaderboard": ("leaderboard.cpp", []),
}


def _build(module_name: str) -> bool:
    src_name, libs = _SOURCES[module_name]
    src = os.path.join(_NATIVE_DIR, src_name)
    if not os.path.exists(src):
        return False
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_NATIVE_DIR, f"{module_name}{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        src, f"-I{include}", *libs, "-pthread", "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:
        log.warning("native build of %s failed: %s", module_name, e)
        return False


def _get_native(module_name: str):
    flag = os.environ.get("MNT_NATIVE_LOADER", "auto")
    if flag == "0":
        return None
    with _lock:
        if module_name in _modules:
            return _modules[module_name]
        mod = None
        if _build(module_name):
            if _NATIVE_DIR not in sys.path:
                sys.path.insert(0, _NATIVE_DIR)
            try:
                mod = importlib.import_module(module_name)
                log.info("native C++ module %s enabled", module_name)
            except Exception as e:
                log.warning("native import of %s failed: %s", module_name, e)
        _modules[module_name] = mod
        if mod is None and flag == "1":
            raise RuntimeError(f"MNT_NATIVE_LOADER=1 but {module_name} is unavailable")
        return mod


def get_fastloader():
    """Returns the _fastloader module or None."""
    return _get_native("_fastloader")


def get_leaderboard():
    """Returns the _leaderboard module or None."""
    return _get_native("_leaderboard")
