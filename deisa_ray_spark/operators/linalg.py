"""Tensor linear algebra kernels (B11 matmul dense path, B18 SVD).

Filled in by the tensor-kernel milestone; the join-aggregate matmul lives
in operators/grid_ops.py (grid_matmul_tn).
"""
