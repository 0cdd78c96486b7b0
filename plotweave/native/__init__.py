"""Native (C++) runtime: stream encoder + skeleton tracer.

The shared library is compiled on first use (g++ -O3, cached next to the
source, keyed on source mtime).  All entry points have pure-Python fallbacks;
``available()`` reports whether the fast path is active.
"""

from .loader import available, get_lib

__all__ = ["available", "get_lib"]
