# Executes the upstream reference module in this namespace (test oracle only).
import numpy as _np_compat

# numpy>=2.0 removed np.deprecate; the reference decorates `hanning` with it.
if not hasattr(_np_compat, "deprecate"):
    _np_compat.deprecate = lambda *a, **k: (lambda f: f)

_p = "/root/reference/windows.py"
with open(_p) as _f:
    exec(compile(_f.read(), _p, "exec"))
