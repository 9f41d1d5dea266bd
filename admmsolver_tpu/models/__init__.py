from .objectivefunc import (
    ObjectiveFunctionBase,
    LeastSquares,
    ConstrainedLeastSquares,
    L1Regularizer,
    L2Regularizer,
    NonNegativePenalty,
    SemiPositiveDefinitePenalty,
)
from .problem import EqualityCondition, Model, Problem
