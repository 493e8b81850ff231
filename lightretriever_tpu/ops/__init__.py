"""TPU-native compute ops: pooling, sparsify, flash attention, max-linear-map,
embedding-bag gather-sum, and the exact-kNN / sparse-scorer kernels."""
