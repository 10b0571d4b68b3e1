"""SLAM orchestration: frame/edge graph, keyframing, mapping, loop closure."""
