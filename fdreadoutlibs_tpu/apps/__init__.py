"""Runnable applications composing the full stack (the layer the reference
delegates to fdreadoutmodules)."""
