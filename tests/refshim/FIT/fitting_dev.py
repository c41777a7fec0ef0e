# Stub: only fit_TSneprofile is referenced (HeatPulse_Funcs.py:73-75);
# never called by the golden-tested compute paths.


def fit_TSneprofile(*a, **k):  # pragma: no cover
    raise NotImplementedError("private FIT.fitting_dev stub")
