"""Math layer (reference layer 5, SURVEY §2.5)."""

from .svd import (svd2x2, svd3x3, polar_decomposition,
                  polar_newton3x3, eigh3x3, qr3x3)
from .interpolation import (bspline_weights, linear_bspline_weights,
                            quadratic_bspline_weights, cubic_bspline_weights,
                            stencil_size, base_node)
from .sparse import (CSRMatrix, csr_from_coo, csr_transpose, spmv,
                     spmv_semiring, spmv_mask, SEMIRINGS)
from .solvers import cg, conjugate_residual, minres, dot, axpy, SolveResult
from .transform import (Transform, translation, scaling, rotation_transform,
                        quat_identity, quat_from_axis_angle, quat_mul,
                        quat_rotate, quat_to_matrix, quat_from_matrix,
                        quat_normalize, quat_slerp, euler_to_matrix,
                        rotation_x, rotation_y, rotation_z)
from .bits import (morton3d, morton2d, clz32, common_prefix_length,
                   next_pow2, expand_bits_3d)
from .bigint import BigInt, bigint, bigint_gcd, RationalW, rational_w

__all__ = [
    "svd2x2", "svd3x3", "polar_decomposition", "polar_newton3x3",
    "eigh3x3", "qr3x3",
    "bspline_weights", "linear_bspline_weights", "quadratic_bspline_weights",
    "cubic_bspline_weights", "stencil_size", "base_node",
    "CSRMatrix", "csr_from_coo", "csr_transpose", "spmv", "spmv_semiring",
    "spmv_mask", "SEMIRINGS",
    "cg", "conjugate_residual", "minres", "dot", "axpy", "SolveResult",
    "Transform", "translation", "scaling", "rotation_transform",
    "quat_identity", "quat_from_axis_angle", "quat_mul", "quat_rotate",
    "quat_to_matrix", "quat_from_matrix", "quat_normalize", "quat_slerp",
    "euler_to_matrix", "rotation_x", "rotation_y", "rotation_z",
    "morton3d", "morton2d", "clz32", "common_prefix_length", "next_pow2",
    "expand_bits_3d",
    "BigInt", "bigint", "bigint_gcd", "RationalW", "rational_w",
]
