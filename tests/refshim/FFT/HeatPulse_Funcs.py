# Executes the upstream reference heat-pulse driver in this namespace
# (test oracle only).  Private deps (IO, FIT, pybaseutils.plt_utils) are
# satisfied by sibling stubs; np.asscalar (removed in modern NumPy) is
# restored first since the reference calls it at :512-514.
import numpy as _np_patch

if not hasattr(_np_patch, "asscalar"):
    _np_patch.asscalar = lambda a: _np_patch.asarray(a).item()

_p = "/root/reference/HeatPulse_Funcs.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
