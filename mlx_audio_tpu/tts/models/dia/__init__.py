from .dia import Model
from .config import DiaConfig
