"""Neural models: the EdgeUNet edge-weight predictor."""

from image_compression_tpu.models.unet import EdgeUNet  # noqa: F401
