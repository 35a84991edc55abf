"""Pure (no-Ray) numeric / text kernels used inside Ray Data stages."""
