from .linop import (
    MatrixBase,
    DenseMatrix,
    DiagonalMatrix,
    ScaledIdentityMatrix,
    PartialDiagonalMatrix,
    identity,
    asmatrixtype,
    matrix_hash,
    matmul,
    add,
)
from .prox import soft_threshold, project_nonneg, psd_project
