"""Shared lazy build-with-make ctypes loader for the native libraries.

Both native components (tokenizer, FLAC codec) build on first use with
`make` and degrade gracefully when no compiler is available; this is the
one copy of that subprocess-make + CDLL + failure-latch logic.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional

_DIR = os.path.dirname(os.path.abspath(__file__))


class LazyNativeLib:
    """Builds and loads one shared library on first use.

    lib_name: the .so filename (also the make target when `make_target`
    is unset — passing no target runs the Makefile default).
    configure: called once with the loaded CDLL to set restype/argtypes.
    Build or load failure is latched: later calls return None cheaply.
    """

    def __init__(self, lib_name: str, make_target: Optional[str] = None,
                 configure: Optional[Callable[[ctypes.CDLL], None]] = None):
        self._path = os.path.join(_DIR, lib_name)
        self._target = make_target
        self._configure = configure
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._failed = False

    def load(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._lib is not None or self._failed:
                return self._lib
            if not os.path.exists(self._path):
                cmd = ['make', '-C', _DIR]
                if self._target:
                    cmd.append(self._target)
                try:
                    subprocess.run(cmd, check=True, capture_output=True)
                except Exception:
                    self._failed = True
                    return None
            try:
                lib = ctypes.CDLL(self._path)
            except OSError:
                self._failed = True
                return None
            if self._configure is not None:
                self._configure(lib)
            self._lib = lib
            return self._lib
