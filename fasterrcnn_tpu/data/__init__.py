"""Host-side data pipeline: VOC parsing, image IO, padded/bucketed batching."""
