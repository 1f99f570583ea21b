"""Multi-chip execution: device meshes, sharded index build/search.

The reference is single-node shared-memory (rayon, SURVEY.md §2.8); this
layer is the new TPU design surface: vectors sharded over a ("dp", "tp")
mesh, partial dot products reduced over "tp" ICI, per-shard top-k merged
over "dp" with all_gather.
"""
