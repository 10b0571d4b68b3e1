"""Multi-chip execution: device meshes and sharded EM steps."""
