"""Device-mesh scale-out: data-parallel batches, tensor-parallel detector head."""
