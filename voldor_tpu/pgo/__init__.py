"""7-DoF (Sim3-style) pose-graph optimization — JAX LM + matrix-free CG."""
