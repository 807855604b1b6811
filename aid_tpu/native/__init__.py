"""Native (C++) host-side components, loaded via ctypes.

Built by native/build.sh; importing this package without the built .so
raises ImportError, which callers treat as "use the Python fallback"
(aid_tpu/prior/beta.py::find_minimal_spread_and_path).
"""

from aid_tpu.native import dp_solver

__all__ = ["dp_solver"]
