# Stub of pybaseutils.plt_utils (HeatPulse_Funcs.py:26); only savefig is
# referenced and only from save_fig, which goldens never call.


def savefig(*a, **k):  # pragma: no cover
    raise NotImplementedError("private plt_utils stub")
