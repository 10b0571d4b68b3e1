"""The VO engine: EM over camera poses, depth, and rigidness maps."""
