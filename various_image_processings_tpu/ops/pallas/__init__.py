"""Hand-tiled Pallas TPU kernels — the performance path.

The reference's CUDA layer stages `(bw+k−1)×(bh+k−1)` halo tiles into shared
memory before each stencil loop (src/bilateral_filter_impl.cu:47-56); here
the same dataflow is expressed as HBM→VMEM halo blocks via `pl.Element`
BlockSpecs, with Mosaic's automatic grid pipelining providing the double
buffering the CUDA code gets from cooperative smem fills.
"""
