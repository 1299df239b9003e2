"""Numeric kernels: Gaussian rasterizer, mesh rasterizer, geometry ops."""
