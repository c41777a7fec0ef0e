from .Struct import Struct  # noqa: F401
from . import utils  # noqa: F401
from .utils import detrend_none, detrend_mean, detrend_linear  # noqa: F401
