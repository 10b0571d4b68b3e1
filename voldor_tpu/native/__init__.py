"""Native (C++) runtime components, exposed via ctypes.

Built on demand with g++ (`make -C voldor_tpu/native` or automatically on
first import of voldor_tpu.native.io). pybind11 is not available in this
environment, so the ABI is plain C.
"""
