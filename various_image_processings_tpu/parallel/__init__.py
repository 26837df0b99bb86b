"""Multi-chip layer: batch sharding over ICI meshes and spatial sharding with
halo exchange. The reference is a single-GPU library; this layer is the
TPU-native scaling story (SURVEY.md §2: shard_map batch fan-out, ppermute
halos for images larger than one chip's VMEM/HBM budget)."""
