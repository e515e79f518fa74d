"""gluefactory_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for training and
evaluating deep local-feature extractors and matchers.

Built from scratch with the capabilities of Glue Factory (reference:
canyagmur/cs566-project-lightglue): SuperPoint-style detection, the LightGlue
matcher as fused TPU kernels, homography/MegaDepth training pipelines,
HPatches/MegaDepth-1500 benchmarks, and TPU-native batched robust estimators
replacing the reference's C++ RANSAC backends.

Design principles (TPU-first, not a port):
  - static shapes everywhere: keypoint sets are padded to a fixed N with boolean
    validity masks threaded through extractor -> matcher -> loss.
  - functional models: flax.linen modules, params as pytrees, `jax.jit`-compiled
    train/eval steps; per-layer remat instead of torch checkpointing.
  - SPMD: a `jax.sharding.Mesh` with a "data" axis; batch-sharded pjit train
    step, psum gradient reduction, psum-based NaN step veto.
  - Pallas kernels for the hot ops (fused attention, match assignment).
"""

import logging

__version__ = "0.1.0"

logger = logging.getLogger("gluefactory_tpu")
if not logger.handlers:  # mirror of reference gluefactory/__init__.py:5-15
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s")
    )
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False
