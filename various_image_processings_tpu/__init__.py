"""various_image_processings_tpu — a TPU-native image-processing framework.

A from-scratch JAX / Pallas / shard_map reimplementation of the capabilities
of the reference C++/CUDA library `yuyuyu-bot/various_image_processings`:

- bilateral / joint bilateral / adaptive bilateral filters
- bilateral texture filter (Cho et al. 2014)
- Sobel-style gradient magnitude
- SLIC superpixels
- Wexler exemplar-based inpainting
- border-replicated integral images

Compute runs as fused XLA programs or hand-tiled Pallas TPU kernels; batches
shard over ICI meshes via shard_map; large single images can be spatially
sharded with ppermute halo exchange.
"""

__version__ = "0.1.0"

from . import core as core
from . import golden as golden
from . import ops as ops
from . import parallel as parallel
from . import models as models
from . import utils as utils

from .ops import (
    gradient as gradient,
    bilateral_filter as bilateral_filter,
    joint_bilateral_filter as joint_bilateral_filter,
    adaptive_bilateral_filter as adaptive_bilateral_filter,
    bilateral_texture_filter as bilateral_texture_filter,
    integral_image as integral_image,
    window_sums as window_sums,
    superpixel_slic as superpixel_slic,
    inpainting_wexler as inpainting_wexler,
)
