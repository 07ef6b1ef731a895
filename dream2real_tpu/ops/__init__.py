"""Low-level JAX/Pallas ops: SE(3) math, image ops, hash-grid encoding."""
