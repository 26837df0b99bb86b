"""High-level pipelines ("model families"): the bilateral texture filter,
SLIC superpixels, and Wexler inpainting — iterative/compound algorithms built
from the ops layer."""
