"""High-level pipelines ("model families"): the bilateral texture filter,
SLIC superpixels, and Wexler inpainting — iterative/compound algorithms built
from the ops layer — plus the class-style shape-specialized filter API."""

from .filters import BilateralFilter as BilateralFilter
from .filters import AdaptiveBilateralFilter as AdaptiveBilateralFilter
from .filters import BilateralTextureFilter as BilateralTextureFilter
from .slic import SuperpixelSLIC as SuperpixelSLIC
from .inpainting import WexlerInpainting as WexlerInpainting
