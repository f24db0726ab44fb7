"""Pure-numpy codec kernels (no Spark imports — unit-testable standalone)."""
