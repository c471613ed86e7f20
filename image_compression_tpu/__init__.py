"""TPU-native learned image compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
moritzschramm/image-compression-cpp (C++/CUDA/libtorch): learn per-pixel edge
weights with a U-Net, solve multicut to segment images into well-compressible
slices, write each slice as a PNG plus binary position metadata, and reassemble
losslessly. Training is two-phase: supervised pretraining against classical
segmentation targets, then online REINFORCE with an on-device PNG-size
estimator as reward.

Layer map (mirrors reference layers, see SURVEY.md):
  config            -- typed runtime config (replaces configuration.h)
  io/               -- PNG I/O, metadata.bin codec (byte-compatible), slicer,
                       reassembler, dataset converter (native C++ fast path)
  ops/              -- batched TPU compute: classical edge extractors, multicut
                       solver, segment stats, PNG size estimator, rewards
  models/           -- EdgeUNet (flax linen, NHWC)
  train/            -- pretraining + REINFORCE drivers, data pipeline,
                       checkpointing, metrics
  parallel/         -- device mesh, shardings, collectives
  utils/            -- synthetic pattern + random partition generators, profiling
"""

__version__ = "0.1.0"

from image_compression_tpu.config import Config, EdgeTarget  # noqa: F401
