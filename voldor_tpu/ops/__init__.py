"""Pure-function compute kernels (jnp / vmap / scan / Pallas).

Everything in this package is shape-polymorphic over leading batch dims,
side-effect free, and jit-safe. Modules:

  lie            SO(3)/SE(3)/quaternion math (batched Rodrigues etc.)
  image          bilinear sampling (CUDA-texture parity), separable blur
  fisk           the log-logistic flow-residual model
  fb_smooth      HMM forward-backward rigidness smoothing (assoc. scan)
  meanshift      Gaussian-kernel meanshift mode seeking
  robust_gaussian truncated-Gaussian EM with Ledoit-Wolf shrinkage
  p3p            batched LambdaTwist P3P/P4P minimal solver
  epipolar       batched 8-point essential-matrix bootstrap (RANSAC/LMedS)
  solvers        small dense Levenberg-Marquardt used by falign/pgo
"""
