"""Drop-in shim for the reference's ``pyvoldor_full`` Cython extension.

Reference client code does ``import pyvoldor_full as pyvoldor`` (or relies
on the install step renaming the extension to ``pyvoldor``) and calls
``pyvoldor.voldor(...)``, ``pyvoldor.falign(...)``, ``pyvoldor.pgo(...)``
(slam_py/install/pyvoldor_full.pyx:14-198).  The TPU rebuild's entry points
carry the same names, argument orders, shapes, and return dicts, so the
shim is pure re-export.
"""

from voldor_tpu.vo.api import voldor
from voldor_tpu.falign.api import falign
from voldor_tpu.pgo.api import pgo

__all__ = ["voldor", "falign", "pgo"]
