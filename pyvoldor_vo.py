"""Drop-in shim for the reference's VO-only ``pyvoldor_vo`` extension.

The vo-only build exposes just ``voldor`` (slam_py/install/
pyvoldor_vo.pyx:14-70); same argument order and return dict here.
"""

from voldor_tpu.vo.api import voldor

__all__ = ["voldor"]
