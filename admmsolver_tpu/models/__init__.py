from .objectivefunc import (
    ObjectiveFunctionBase,
    LeastSquares,
    ConstrainedLeastSquares,
    L1Regularizer,
    L2Regularizer,
    GroupL1Regularizer,
    HuberLoss,
    NonNegativePenalty,
    NuclearNormPenalty,
    BoxProjectionPenalty,
    SemiPositiveDefinitePenalty,
)
from .problem import EqualityCondition, Model, Problem
from .realify import (
    RealifiedModel,
    RealPartProx,
    realify_matrix,
    realify_model,
    realify_objective,
)
