from .momentum import (
    JacobiMomentumConfig,
    KrylovMomentumConfig,
    RBGSMomentumConfig,
    solve_u_momentum,
    solve_v_momentum,
)
from .pressure import (
    JacobiPressureConfig,
    PressureSolveInfo,
    RBGSPressureConfig,
    jacobi_sweep,
    rbgs_sweep,
    solve_pressure,
)
from .velocity import update_velocity
