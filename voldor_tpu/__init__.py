"""voldor_tpu — a TPU-native dense-indirect SLAM framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of VOLDOR-SLAM
(reference: htkseason/VOLDOR). The system consumes dense optical flow (plus
optional disparity / depth priors) and alternates, EM-style, between

  * per-frame camera pose inference (batched P3P hypotheses -> meanshift
    mode seeking -> truncated-Gaussian covariance refinement),
  * per-pixel depth inference (PatchMatch-style proposals under a
    log-logistic / Fisk flow-residual model), and
  * per-pixel rigidness (inlier probability) maps,

with a SLAM layer on top: keyframing, dense frame alignment for mapping
links, loop closure and 7-DoF pose-graph optimization.

Design stance (TPU-first, not a CUDA translation):
  * the whole EM window state lives on device as one pytree; each EM phase
    is a single jitted dispatch with static shapes (masked windows instead
    of the reference's dynamic truncation),
  * hand-derived Jacobians (frame alignment) are replaced by autodiff,
  * Ceres solvers are replaced by JAX Gauss-Newton / Levenberg-Marquardt,
  * sequential scans (HMM smoothing, depth propagation) are reformulated
    as associative scans / jump-flooding sweeps that fill the VPU.

Public API parity with the reference's `pyvoldor` FFI surface:
  voldor_tpu.voldor(...)  == pyvoldor.voldor   (slam_py/install/pyvoldor_full.pyx:14-70)
  voldor_tpu.falign(...)  == pyvoldor.falign   (pyvoldor_full.pyx:88-154)
  voldor_tpu.pgo(...)     == pyvoldor.pgo      (pyvoldor_full.pyx:167-198)
"""

import os as _os

import jax as _jax

# VOLDOR_BACKEND=cpu pins the local CPU backend for any entry point that
# imports the package (demo CLI, ad-hoc scripts). The JAX_PLATFORMS env
# var alone is NOT honored on this platform (the axon TPU plugin
# force-registers; see docs/PLATFORM_NOTES.md) and a dead remote-TPU
# tunnel HANGS on first device touch instead of raising — this hook is
# the supported escape hatch.
if _os.environ.get("VOLDOR_BACKEND") == "cpu":
    _jax.config.update("jax_platforms", "cpu")

# Geometry/SLAM numerics need true fp32 contractions. JAX's DEFAULT matmul
# precision may compute f32 matmuls with bf16 passes (fine for NN training,
# fatal for pose math: 3x3 rotation products lose ~4e-2 absolute here).
# Hot kernels that can tolerate lower precision opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: do NOT enable the persistent compilation cache here. Executables
# deserialized from the cache run >1000x slower on the axon remote-TPU
# platform (measured: 0.9ms fresh-compiled vs 1.1s cache-loaded for the
# same depth round), and XLA:CPU AOT reloads warn about machine-feature
# mismatches. Recompiling every process is the lesser evil.

from voldor_tpu.config import VoldorConfig

__version__ = "0.1.0"

__all__ = ["VoldorConfig", "voldor", "falign", "pgo", "__version__"]


def voldor(*args, **kwargs):
    from voldor_tpu.vo.api import voldor as _voldor

    return _voldor(*args, **kwargs)


def falign(*args, **kwargs):
    from voldor_tpu.falign.api import falign as _falign

    return _falign(*args, **kwargs)


def pgo(*args, **kwargs):
    from voldor_tpu.pgo.api import pgo as _pgo

    return _pgo(*args, **kwargs)
