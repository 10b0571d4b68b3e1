"""Host-side utilities: flow IO, profiling."""
