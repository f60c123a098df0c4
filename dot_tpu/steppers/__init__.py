from .core import System, SimState  # noqa: F401
from .dot import DOTStepper  # noqa: F401
from .newton import NewtonStepper  # noqa: F401
