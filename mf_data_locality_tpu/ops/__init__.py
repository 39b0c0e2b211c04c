"""Reference-element and operator kernels (quadrature, 1D bases, FE operators)."""
