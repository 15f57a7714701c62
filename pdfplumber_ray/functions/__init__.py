"""Pure vectorized kernels — numpy in, numpy out; no Ray imports."""
