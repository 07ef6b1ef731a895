"""Dataset IO: RGB-D loading, dynamic masks, synthetic scene generation."""
