"""Dense pairwise frame alignment (mapping links) — JAX LM + autodiff."""
