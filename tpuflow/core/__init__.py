"""Pure-JAX model library: flow networks and their building blocks."""
