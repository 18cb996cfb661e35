from .insim import InsIM
from .insimex import InsIMEX
from .supg import SCnsIM, SerialSCnsIM, SUPGFluidSolver, SUPGInsIM
from .scnsex import SCnsEX

__all__ = ["InsIM", "InsIMEX", "SCnsIM", "SerialSCnsIM",
           "SUPGFluidSolver", "SUPGInsIM", "SCnsEX"]
