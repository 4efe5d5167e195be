"""Reference-compatible ``utils`` package (timing, labels) — shims over
image_transformation_tpu.core."""
