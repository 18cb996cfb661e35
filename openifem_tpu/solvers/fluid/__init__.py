from .insim import InsIM
from .insimex import InsIMEX
from .supg import SCnsIM, SerialSCnsIM, SUPGInsIM
from .scnsex import SCnsEX

__all__ = ["InsIM", "InsIMEX", "SCnsIM", "SerialSCnsIM", "SUPGInsIM",
           "SCnsEX"]
